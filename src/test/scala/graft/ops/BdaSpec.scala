package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BDA sizing-model laws: sinc inversion, baseline monotonicity
  * (longer baseline ⇒ bins no larger), divisor discipline.
  */
class BdaSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def sinc(x: Double) = if (x == 0) 1.0 else math.sin(x) / x

  test("sincInv inverts sinc to double precision") {
    Seq(0.5, 0.9, 0.99, 0.995, 0.999).foreach { d =>
      assert(math.abs(sinc(Bda.sincInv(d)) - d) < 1e-12)
    }
  }

  test("sincInv is monotone: tighter decorrelation => smaller threshold") {
    assert(Bda.sincInv(0.999) < Bda.sincInv(0.99))
    assert(Bda.sincInv(0.99) < Bda.sincInv(0.9))
  }

  /** A frame with two baselines of controlled |uv|. */
  private def frame(blShort: Double, blLong: Double) = {
    val rows = for {
      (a2, bl) <- Seq((1, blShort), (2, blLong))
      t <- 0 until 4
    } yield (1000.0 + t * 10.0, 10.0, 1000.0 + t * 10.0, 10.0,
      0, a2, 0, 0, 0, Seq(bl, 0.0, 0.0), false)
    rows.toDF("TIME", "INTERVAL", "TIME_CENTROID", "EXPOSURE",
        "ANTENNA1", "ANTENNA2", "FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER",
        "UVW", "FROW")
      .withColumn("NUM_CHAN", lit(16))
      .withColumn("TOTAL_BANDWIDTH", lit(1.6e9))
      .withColumn("CHAN_WIDTH_0", lit(1.0e8))
      .withColumn("FREQ_MAX", lit(1.5e9))
  }

  test("longer baseline gets a time bin no larger and a channel bin no larger") {
    val args = Bda.Args(decorrelation = 0.99, maxFovDeg = 1.0,
      timeBinCapSecs = 1e6, minNchan = 1)
    val sized = Bda.withBinParams(frame(50.0, 5000.0), args)
      .select("ANTENNA2", "TIME_BIN_SECS", "CHAN_BIN")
      .distinct().orderBy("ANTENNA2").collect()
    val (tbShort, cbShort) = (sized(0).getDouble(1), sized(0).getInt(2))
    val (tbLong, cbLong) = (sized(1).getDouble(1), sized(1).getInt(2))
    assert(tbLong <= tbShort)
    assert(cbLong <= cbShort)
    assert(16 % cbShort == 0 && 16 % cbLong == 0) // divisor discipline
  }

  test("time bin respects the floor (min INTERVAL) and the user cap") {
    val capped = Bda.withBinParams(frame(1.0, 2.0),
      Bda.Args(maxFovDeg = 1.0, timeBinCapSecs = 25.0))
      .select("TIME_BIN_SECS").distinct().as[Double].collect()
    assert(capped.forall(_ == 25.0)) // tiny baselines hit the cap
    val floored = Bda.withBinParams(frame(1e7, 2e7),
      Bda.Args(maxFovDeg = 60.0, timeBinCapSecs = 1e6))
      .select("TIME_BIN_SECS").distinct().as[Double].collect()
    assert(floored.forall(_ == 10.0)) // huge baselines floor at INTERVAL
  }

  test("minNchan floors the output channelisation") {
    val sized = Bda.withBinParams(frame(50.0, 60.0),
      Bda.Args(maxFovDeg = 1e-6, minNchan = 4)) // decorr allows full collapse
      .select("CHAN_BIN").distinct().as[Int].collect()
    assert(sized.forall(_ == 4)) // 16 / 4 = minNchan
  }

  test("BDA without WEIGHT_SPECTRUM weights by broadcast WEIGHT exactly") {
    import org.apache.spark.sql.functions._
    val main = graft.ms.MsTables.main(spark)
    val spw = graft.ms.MsTables.spw(spark)
    val ddid = graft.ms.MsTables.ddid(spark)
    val a = Bda.Args(dataCols = Seq("DATA" -> "DATA"))
    val noWs = Bda.averagedMain(
      main.drop("WEIGHT_SPECTRUM", "SIGMA_SPECTRUM"), spw, ddid, a)
    assert(!noWs.columns.contains("WEIGHT_SPECTRUM") &&
      !noWs.columns.contains("SIGMA_SPECTRUM"))
    val bcast = Bda.averagedMain(
      main.drop("SIGMA_SPECTRUM").withColumn("WEIGHT_SPECTRUM",
        transform(col("DATA"), _ => col("WEIGHT"))), spw, ddid, a)
    val key = Seq("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER",
      "ANTENNA1", "ANTENNA2", "TIME")
    val j = noWs.as("x").join(
      bcast.select((key.map(col) :+ col("DATA").as("DATA_B")): _*).as("y"), key)
    assert(j.count() == noWs.count())
    assert(j.filter(col("DATA") =!= col("DATA_B")).count() == 0)
  }

  test("|uv| = 0 baselines size finitely: cap'd time bin, floor'd channelisation") {
    // an autocorrelation baseline (ANTENNA1 == ANTENNA2, UVW = 0) must
    // not divide by BL_MAX = 0 — time bin degenerates to the user cap,
    // channel factor to the min_nchan floor
    val rows = (0 until 4).map(t => (1000.0 + t * 10.0, 10.0,
      1000.0 + t * 10.0, 10.0, 3, 3, 0, 0, 0, Seq(0.0, 0.0, 0.0), false))
    val auto = rows.toDF("TIME", "INTERVAL", "TIME_CENTROID", "EXPOSURE",
        "ANTENNA1", "ANTENNA2", "FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER",
        "UVW", "FROW")
      .withColumn("NUM_CHAN", lit(16))
      .withColumn("TOTAL_BANDWIDTH", lit(1.6e9))
      .withColumn("CHAN_WIDTH_0", lit(1.0e8))
      .withColumn("FREQ_MAX", lit(1.5e9))
    val sized = Bda.withBinParams(auto,
      Bda.Args(maxFovDeg = 1.0, timeBinCapSecs = 25.0, minNchan = 4,
        includeAutoCorrs = true))
      .select("TIME_BIN_SECS", "CHAN_BIN").distinct().collect()
    assert(sized.length == 1)
    assert(sized(0).getDouble(0) == 25.0) // finite: the cap, not Inf/NaN
    assert(sized(0).getInt(1) == 4)       // full collapse down to minNchan
  }

  test("--include-auto-correlations keeps autocorr baselines end-to-end") {
    val main = graft.ms.MsTables.main(spark)
    val spw = graft.ms.MsTables.spw(spark)
    val ddid = graft.ms.MsTables.ddid(spark)
    val on = Bda.Args(dataCols = Seq("DATA" -> "DATA"),
      timeBinCapSecs = 90000.0, includeAutoCorrs = true)
    val isAuto = col("ANTENNA1") === col("ANTENNA2")
    // default (flag off): autocorrs filtered, reference TAQL parity
    val off = Bda.prepared(main, spw, ddid, on.copy(includeAutoCorrs = false))
    assert(off.filter(isAuto).count() == 0)
    // flag on: sizing is finite for every baseline and the averaged
    // OUTPUT still carries the autocorr population
    val sized = Bda.withBinParams(Bda.prepared(main, spw, ddid, on), on)
    assert(sized.filter(isAuto).count() > 0)
    assert(sized.filter(col("TIME_BIN_SECS").isNull ||
      isnan(col("TIME_BIN_SECS")) ||
      col("TIME_BIN_SECS") > 90000.0).count() == 0)
    assert(Bda.averagedMain(main, spw, ddid, on).filter(isAuto).count() > 0)
  }

  test("running bins equal grid bins on regularly sampled data (full pipeline)") {
    // regular sampling: t - t0 == accumulated-INTERVAL-before-row per
    // baseline, so the two walks must agree bin-for-bin and the whole
    // averaged output must match bit-for-bit
    val main = graft.ms.MsTables.main(spark)
    val spw = graft.ms.MsTables.spw(spark)
    val ddid = graft.ms.MsTables.ddid(spark)
    def run(running: Boolean) = Bda.averagedMain(main, spw, ddid,
      Bda.Args(dataCols = Seq("DATA" -> "DATA"), runningBins = running))
    val grid = run(running = false)
    val runn = run(running = true)
    assert(grid.count() == runn.count())
    assert(runn.join(grid, runn.columns.toSeq).count() == grid.count(),
      "running-bin BDA diverges from grid binning on regular sampling")
  }

  test("regenerate emits uniform linspace grids over the original span") {
    val spw = Seq((0, 16,
      (0 until 16).map(i => 1.0e9 + 1.0e8 * (i + 0.5)),
      Seq.fill(16)(1.0e8), 1.8e9, 1.6e9, 5))
      .toDF("SPECTRAL_WINDOW_ID", "NUM_CHAN", "CHAN_FREQ", "CHAN_WIDTH",
        "REF_FREQUENCY", "TOTAL_BANDWIDTH", "MEAS_FREQ_REF")
      .withColumn("EFFECTIVE_BW", col("CHAN_WIDTH"))
      .withColumn("RESOLUTION", col("CHAN_WIDTH"))
    val (newSpw, newDdid, remap) =
      Bda.regenerate(spark, Seq((0, 0, 0, 4), (1, 0, 1, 8)), spw)
    val rows = newSpw.orderBy("SPECTRAL_WINDOW_ID").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getAs[Int]("NUM_CHAN") == 4)
    // span [1e9, 2.6e9), cw = 4e8, centres at 1.2e9, 1.6e9, 2.0e9, 2.4e9
    assert(r0.getSeq[Double](r0.fieldIndex("CHAN_FREQ")) ==
      Seq(1.2e9, 1.6e9, 2.0e9, 2.4e9))
    assert(r0.getSeq[Double](r0.fieldIndex("CHAN_WIDTH")) == Seq.fill(4)(4.0e8))
    assert(newDdid.count() == 2)
    assert(remap.orderBy("NEW_DDID").collect().map(_.getInt(2)).toSeq == Seq(0, 1))
  }
}
