package graft.expressions

import graft.SparkSpec
import graft.ms.MsTables
import graft.ops.{Flags, TimeAvg, VisAggregator}
import org.apache.spark.sql.functions._

/** The native TypedImperativeAggregate kernel must match the typed
  * Aggregator reference implementation bit-for-bit on the full fixture
  * MS — every output cell of DATA/FLAG/WEIGHT_SPECTRUM/SIGMA_SPECTRUM,
  * across both SPW shapes, both populations, and ragged channel tails.
  */
class VisAvgAggSpec extends SparkSpec {

  private def prepped(binSecs: Double) =
    TimeAvg.assignGrid(
      Flags.filterAutocorr(MsTables.main(spark))
        .withColumn("FROW", Flags.derivedFlagRow),
      binSecs)

  private def compare(chanBin: Int, useWs: Boolean, emitSs: Boolean): Unit = {
    val df = prepped(60000.0)
    val keys = TimeAvg.BinKey.map(col)
    def agg(c: org.apache.spark.sql.Column) =
      df.groupBy(keys: _*).agg(c.as("V")).select(keys :+ col("V.*"): _*)
    val ref = agg(VisAggregator.visAvg(useWs, emitSs)(
      col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
      col("SIGMA_SPECTRUM"), col("WEIGHT"), lit(chanBin)))
    val native = agg(VisAvgAgg(useWs, emitSs)(
      col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
      col("SIGMA_SPECTRUM"), col("WEIGHT"), lit(chanBin)))
    assert(ref.count() == native.count())
    // bit-exact: an inner join on EVERY column (including the nested
    // float matrices) must retain every row
    val joined = native.join(ref, native.columns.toSeq)
    assert(joined.count() == ref.count(),
      s"native kernel diverges from reference (chanBin=$chanBin, ws=$useWs, ss=$emitSs)")
  }

  test("matches the Aggregator bit-for-bit (chanBin 1, WS weights)") {
    compare(chanBin = 1, useWs = true, emitSs = true)
  }

  test("matches the Aggregator bit-for-bit (chanBin 4 ragged, WS weights)") {
    compare(chanBin = 3, useWs = true, emitSs = true)
  }

  test("matches the Aggregator bit-for-bit (WEIGHT fallback, no sigma)") {
    compare(chanBin = 4, useWs = false, emitSs = false)
  }

  test("randomized property: native == Aggregator on adversarial inputs") {
    // seeded random rows with the nasty cases the fixture can't hit:
    // zero-weight cells, rows fully flagged, groups fully flagged,
    // ragged chanBin tails. Values live on DYADIC grids (k/16, k/256)
    // so every sum is exact in double and the bit-for-bit compare is
    // independent of Spark's nondeterministic partial-merge order.
    import VisAggregator.{Cpx, VisIn}
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(1234)
    def mat(nch: Int, nco: Int)(f: () => Double): Seq[Seq[Double]] =
      Seq.fill(nch)(Seq.fill(nco)(f()))
    val rows = (0 until 200).map { i =>
      val nch = 5; val nco = 2
      val w0 = rnd.nextInt(4) == 0 // 25% zero-weight cells
      (i % 13, VisIn(
        FROW = rnd.nextInt(5) == 0,
        DATA = Seq.fill(nch)(Seq.fill(nco)(Cpx(
          (rnd.nextInt(2049) - 1024).toFloat, (rnd.nextInt(2049) - 1024).toFloat))),
        FLAG = Seq.fill(nch)(Seq.fill(nco)(rnd.nextInt(3) == 0)),
        WEIGHT_SPECTRUM = mat(nch, nco)(() =>
          if (w0) 0.0 else rnd.nextInt(1 << 16) / 16.0),
        SIGMA_SPECTRUM = mat(nch, nco)(() => rnd.nextInt(256) / 16.0),
        WEIGHT = Seq.fill(nco)(rnd.nextInt(1 << 10) / 16.0),
        CHAN_BIN = 1 + rnd.nextInt(4))) // ragged tails at 2,3,4
    }
    // CHAN_BIN must be constant per group — keyed by it
    val df = rows.map { case (g, v) => (g, v.CHAN_BIN, v.FROW, v.DATA,
      v.FLAG, v.WEIGHT_SPECTRUM, v.SIGMA_SPECTRUM, v.WEIGHT) }
      .toDF("g", "CHAN_BIN", "FROW", "DATA", "FLAG", "WEIGHT_SPECTRUM",
        "SIGMA_SPECTRUM", "WEIGHT")
    def agg(c: org.apache.spark.sql.Column) =
      df.groupBy("g", "CHAN_BIN").agg(c.as("V")).select(col("g"), col("V.*"))
    val ref = agg(VisAggregator.visAvg(true, true)(
      col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
      col("SIGMA_SPECTRUM"), col("WEIGHT"), col("CHAN_BIN")))
    val native = agg(VisAvgAgg(true, true)(
      col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
      col("SIGMA_SPECTRUM"), col("WEIGHT"), col("CHAN_BIN")))
    assert(ref.count() == native.count())
    assert(native.join(ref, native.columns.toSeq).count() == ref.count(),
      "native kernel diverges on randomized input")
  }

  test("native RowAvgAgg matches the row Aggregator bit-for-bit") {
    val df = prepped(60000.0)
    val keys = TimeAvg.BinKey.map(col)
    def agg(c: org.apache.spark.sql.Column) =
      df.groupBy(keys: _*).agg(c.as("R")).select(keys :+ col("R.*"): _*)
    val ref = agg(VisAggregator.rowAvg(
      col("TIME"), col("INTERVAL"), col("TIME_CENTROID"), col("EXPOSURE"),
      col("FROW"), col("UVW"), col("WEIGHT"), col("SIGMA")))
    val native = agg(RowAvgAgg(
      col("TIME"), col("INTERVAL"), col("TIME_CENTROID"), col("EXPOSURE"),
      col("FROW"), col("UVW"), col("WEIGHT"), col("SIGMA")))
    assert(ref.count() == native.count())
    val joined = native.join(ref, native.columns.toSeq)
    assert(joined.count() == ref.count(), "native row kernel diverges")
  }
}
