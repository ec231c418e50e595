package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Value-level tests of the averaging kernel's semantics (SURVEY §5b):
  * flag truth table, weighted-average arithmetic, dual-population
  * fallback, channel re-binning, bin-size-1 identity.
  *
  * Mirrors what the reference delegates to its kernel dependency's test
  * suite; here every expectation is hand-computed.
  */
class VisAggregatorSpec extends SparkSpec {
  import VisAggregator.{Cpx, RowIn, VisIn}

  private lazy val s = spark
  import s.implicits._

  private val eps = 1e-12

  /** One row: (frow, data(chan)(corr), flag, ws, ss, weight, chan_bin). */
  private def visDf(rows: Seq[VisIn]) = rows.toDF(
    "FROW", "DATA", "FLAG", "WEIGHT_SPECTRUM", "SIGMA_SPECTRUM", "WEIGHT",
    "CHAN_BIN")

  private def runVisFull(rows: Seq[VisIn], chanBin: Int = 1,
                         useWs: Boolean = true): Row =
    visDf(rows.map(_.copy(CHAN_BIN = chanBin)))
      .groupBy()
      .agg(VisAggregator.visAvg(useWs)(
        col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
        col("SIGMA_SPECTRUM"), col("WEIGHT"), col("CHAN_BIN")).as("V"))
      .select("V.*")
      .collect()(0)

  private def runVis(rows: Seq[VisIn], chanBin: Int = 1,
                     useWs: Boolean = true): (Seq[Seq[Row]], Seq[Seq[Boolean]]) = {
    val out = runVisFull(rows, chanBin, useWs)
    (out.getSeq[scala.collection.Seq[Row]](out.fieldIndex("DATA")).map(_.toSeq).toSeq,
      out.getSeq[scala.collection.Seq[Boolean]](out.fieldIndex("FLAG")).map(_.toSeq).toSeq)
  }

  private def in(frow: Boolean, re: Float, im: Float, fl: Boolean, w: Double,
                 sig: Double = 1.0) =
    VisIn(frow, Seq(Seq(Cpx(re, im))), Seq(Seq(fl)), Seq(Seq(w)),
      Seq(Seq(sig)), Seq(w), 1)

  test("weighted complex average over unflagged samples") {
    // (1+2i)*3 + (5-4i)*1 over w=4 → (8/4, 2/4) = (2, 0.5)
    val (data, flag) = runVis(Seq(
      in(frow = false, 1f, 2f, fl = false, 3.0),
      in(frow = false, 5f, -4f, fl = false, 1.0)))
    assert(math.abs(data(0)(0).getFloat(0) - 2.0f) < 1e-6)
    assert(math.abs(data(0)(0).getFloat(1) - 0.5f) < 1e-6)
    assert(flag == Seq(Seq(false)))
  }

  test("flagged sample excluded from effective average") {
    val (data, flag) = runVis(Seq(
      in(frow = false, 1f, 0f, fl = false, 2.0),
      in(frow = false, 100f, 100f, fl = true, 50.0))) // excluded
    assert(data(0)(0).getFloat(0) == 1f)
    assert(data(0)(0).getFloat(1) == 0f)
    assert(flag == Seq(Seq(false)))
  }

  test("all-flagged cell falls back to nominal population and is flagged") {
    val (data, flag) = runVis(Seq(
      in(frow = false, 2f, 2f, fl = true, 1.0),
      in(frow = false, 4f, 4f, fl = true, 3.0)))
    // nominal: (2*1 + 4*3)/4 = 3.5
    assert(math.abs(data(0)(0).getFloat(0) - 3.5f) < 1e-6)
    assert(flag == Seq(Seq(true)))
  }

  test("row flag (FROW) excludes every cell of the row") {
    val (data, flag) = runVis(Seq(
      in(frow = false, 1f, 1f, fl = false, 1.0),
      in(frow = true, 9f, 9f, fl = false, 9.0))) // row-flagged
    assert(data(0)(0).getFloat(0) == 1f)
    assert(flag == Seq(Seq(false)))
  }

  test("channel re-binning averages k adjacent channels (weights from WS)") {
    val row = VisIn(FROW = false,
      DATA = Seq(Seq(Cpx(1f, 0f)), Seq(Cpx(3f, 0f)), Seq(Cpx(10f, 0f))),
      FLAG = Seq(Seq(false), Seq(false), Seq(false)),
      WEIGHT_SPECTRUM = Seq(Seq(1.0), Seq(3.0), Seq(2.0)),
      SIGMA_SPECTRUM = Seq(Seq(1.0), Seq(1.0), Seq(1.0)),
      WEIGHT = Seq(1.0), CHAN_BIN = 1)
    val (data, flag) = runVis(Seq(row), chanBin = 2)
    // bin0: (1*1 + 3*3)/4 = 2.5 ; bin1 (ragged tail): 10
    assert(data.length == 2)
    assert(math.abs(data(0)(0).getFloat(0) - 2.5f) < 1e-6)
    assert(data(1)(0).getFloat(0) == 10f)
    assert(flag == Seq(Seq(false), Seq(false)))
  }

  test("WEIGHT fallback when WEIGHT_SPECTRUM unused") {
    val (data, _) = runVis(Seq(
      in(frow = false, 2f, 0f, fl = false, 4.0),
      in(frow = false, 6f, 0f, fl = false, 12.0)), useWs = false)
    // weights come from WEIGHT (same values here): (8+72)/16 = 5
    assert(math.abs(data(0)(0).getFloat(0) - 5f) < 1e-6)
  }

  test("bin size 1 is identity for the visibility average") {
    val row = in(frow = false, 7.25f, -3.5f, fl = false, 13.0)
    val (data, flag) = runVis(Seq(row))
    assert(data(0)(0).getFloat(0) == 7.25f)
    assert(data(0)(0).getFloat(1) == -3.5f)
    assert(flag == Seq(Seq(false)))
  }

  test("averaged WEIGHT_SPECTRUM = Σw per cell; SIGMA_SPECTRUM = sqrt(Σw²σ²)/Σw") {
    val out = runVisFull(Seq(
      in(frow = false, 1f, 0f, fl = false, 3.0, sig = 0.5),
      in(frow = false, 2f, 0f, fl = false, 1.0, sig = 2.0)))
    val ws = out.getSeq[scala.collection.Seq[Double]](out.fieldIndex("WEIGHT_SPECTRUM"))
    val ss = out.getSeq[scala.collection.Seq[Double]](out.fieldIndex("SIGMA_SPECTRUM"))
    assert(ws.map(_.toSeq) == Seq(Seq(4.0)))
    // sqrt(9·0.25 + 1·4)/4 = 2.5/4
    assert(math.abs(ss(0)(0) - 0.625) < eps)
  }

  test("all-flagged cell: spectra fall back to the nominal population") {
    val out = runVisFull(Seq(
      in(frow = false, 1f, 0f, fl = true, 2.0, sig = 1.0),
      in(frow = false, 2f, 0f, fl = true, 6.0, sig = 1.0)))
    val ws = out.getSeq[scala.collection.Seq[Double]](out.fieldIndex("WEIGHT_SPECTRUM"))
    val ss = out.getSeq[scala.collection.Seq[Double]](out.fieldIndex("SIGMA_SPECTRUM"))
    assert(ws.map(_.toSeq) == Seq(Seq(8.0)))
    // sqrt(4 + 36)/8
    assert(math.abs(ss(0)(0) - math.sqrt(40.0) / 8.0) < eps)
  }

  test("SIGMA_SPECTRUM omitted (empty) when declared absent") {
    val out = visDf(Seq(in(frow = false, 1f, 0f, fl = false, 1.0)))
      .groupBy()
      .agg(VisAggregator.visAvg(useWeightSpectrum = true, emitSigmaSpectrum = false)(
        col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
        lit(null).cast("array<array<double>>"), col("WEIGHT"),
        col("CHAN_BIN")).as("V"))
      .select("V.*").collect()(0)
    assert(out.getSeq[Any](out.fieldIndex("SIGMA_SPECTRUM")).isEmpty)
    val ws = out.getSeq[scala.collection.Seq[Double]](out.fieldIndex("WEIGHT_SPECTRUM"))
    assert(ws.map(_.toSeq) == Seq(Seq(1.0)))
  }

  // --- row-level aggregator ---------------------------------------------

  private def runRow(rows: Seq[RowIn]): Row =
    rows.toDF("TIME", "INTERVAL", "TIME_CENTROID", "EXPOSURE", "FROW",
        "UVW", "WEIGHT", "SIGMA")
      .groupBy()
      .agg(VisAggregator.rowAvg(
        col("TIME"), col("INTERVAL"), col("TIME_CENTROID"), col("EXPOSURE"),
        col("FROW"), col("UVW"), col("WEIGHT"), col("SIGMA")).as("R"))
      .select("R.*").collect()(0)

  private def rowIn(t: Double, dt: Double, frow: Boolean,
                    uvw: Seq[Double], w: Double, sig: Double) =
    RowIn(t, dt, t + 0.25, dt * 0.9, frow, uvw, Seq(w), Seq(sig))

  test("row averages: TIME mean(nom), INTERVAL sum(nom), centroid/exposure eff") {
    val r = runRow(Seq(
      rowIn(10.0, 2.0, frow = false, Seq(1, 2, 3), 2.0, 0.5),
      rowIn(14.0, 2.0, frow = true, Seq(5, 6, 7), 6.0, 1.0)))
    assert(r.getAs[Double]("TIME") == 12.0)          // mean over BOTH rows
    assert(r.getAs[Double]("INTERVAL") == 4.0)       // sum over both
    assert(r.getAs[Double]("TIME_CENTROID") == 10.25) // eff row only
    assert(r.getAs[Double]("EXPOSURE") == 1.8)       // eff row only
    assert(!r.getAs[Boolean]("FLAG_ROW"))
    assert(r.getAs[Long]("N_NOM") == 2 && r.getAs[Long]("N_EFF") == 1)
    // UVW weighted by row-weight over effective rows only → exactly row 1
    assert(r.getSeq[Double](r.fieldIndex("UVW")) == Seq(1.0, 2.0, 3.0))
    // WEIGHT = sum(eff) ; SIGMA = sqrt(w²σ²)/w = σ for a single row
    assert(r.getSeq[Double](r.fieldIndex("WEIGHT")) == Seq(2.0))
    assert(math.abs(r.getSeq[Double](r.fieldIndex("SIGMA")).head - 0.5) < eps)
  }

  test("all-flagged bin: effective falls back to nominal, FLAG_ROW out = true") {
    val r = runRow(Seq(
      rowIn(10.0, 2.0, frow = true, Seq(2, 0, 0), 1.0, 1.0),
      rowIn(14.0, 2.0, frow = true, Seq(6, 0, 0), 3.0, 1.0)))
    assert(r.getAs[Boolean]("FLAG_ROW"))
    assert(r.getAs[Double]("TIME_CENTROID") == 12.25) // nominal mean
    assert(r.getAs[Double]("EXPOSURE") == 3.6)        // nominal sum
    // UVW: (2*1 + 6*3)/4 = 5
    assert(math.abs(r.getSeq[Double](r.fieldIndex("UVW")).head - 5.0) < eps)
  }

  test("SIGMA combines as sqrt(Σ w²σ²)/Σw") {
    val r = runRow(Seq(
      rowIn(0.0, 1.0, frow = false, Seq(0, 0, 0), 3.0, 2.0),
      rowIn(1.0, 1.0, frow = false, Seq(0, 0, 0), 4.0, 1.0)))
    // sqrt(9*4 + 16*1)/7 = sqrt(52)/7
    val expect = math.sqrt(52.0) / 7.0
    assert(math.abs(r.getSeq[Double](r.fieldIndex("SIGMA")).head - expect) < eps)
  }
}
