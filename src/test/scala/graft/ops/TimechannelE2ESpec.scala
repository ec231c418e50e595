package graft.ops

import graft.SparkSpec
import graft.ms.MsTables
import org.apache.spark.sql.functions._

/** Conservation laws of the REAL pipeline on the parquet MS fixture
  * (SURVEY §5c at production grain).
  */
class TimechannelE2ESpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private lazy val main = MsTables.main(spark)
  private def args(binSecs: Double, chanBin: Int) = Timechannel.Args(
    timeBinSecs = binSecs, chanBinSize = chanBin,
    dataCols = Seq("DATA" -> "DATA"))

  test("INTERVAL is conserved per baseline through the full averaging") {
    val in = Flags.filterAutocorr(main)
      .groupBy("DATA_DESC_ID", "ANTENNA1", "ANTENNA2")
      .agg(sum("INTERVAL").as("s_in"))
    val out = Timechannel.averagedMain(main, args(60000.0, 4))
      .groupBy("DATA_DESC_ID", "ANTENNA1", "ANTENNA2")
      .agg(sum("INTERVAL").as("s_out"))
    val joined = in.join(out, Seq("DATA_DESC_ID", "ANTENNA1", "ANTENNA2"), "full")
    assert(joined.filter(col("s_in").isNull || col("s_out").isNull ||
      col("s_in") =!= col("s_out")).count() == 0)
  }

  test("bin sizes 1x1 are identity: row count and values survive") {
    // time bin smaller than the sampling interval, chan bin 1
    val out = Timechannel.averagedMain(main, args(1.0, 1))
    val nIn = Flags.filterAutocorr(main).count()
    assert(out.count() == nIn)
    // spot-check: every output row's TIME equals its TIME_CENTROID
    // population (single-row bins) and DATA survives bit-for-bit where
    // the row is unflagged
    val joined = out.alias("o").join(
      Flags.filterAutocorr(main).alias("i"),
      Seq("DATA_DESC_ID", "ANTENNA1", "ANTENNA2", "TIME"))
    assert(joined.count() == nIn)
    val mismatch = joined.filter(!col("o.FLAG_ROW") &&
      col("o.DATA") =!= col("i.DATA")).count()
    assert(mismatch == 0)
  }

  test("averaging reduces rows by the expected bin factor") {
    // each (field, ddid, baseline) group holds 2 times x 30000 s; a
    // 60000 s bin swallows both -> exactly one output row per group
    val out = Timechannel.averagedMain(main, args(60000.0, 4))
    val nGroups = Flags.filterAutocorr(main)
      .select("DATA_DESC_ID", "FIELD_ID", "ANTENNA1", "ANTENNA2")
      .distinct().count()
    assert(out.count() == nGroups)
  }

  test("channel selection (-ch 0~3,8) flows through the full lifecycle") {
    val out = "/tmp/graft_test/tc_chansel"
    val kept = graft.cli.Arguments.expandChannels(
      graft.cli.Arguments.parseChannels("0~3,8"))
    Timechannel.run(spark, graft.ms.SyntheticMs.root, out,
      args(60000.0, 4).copy(channels = kept, force = true))
    // 5 channels kept from both SPWs (16 and 32 chans), chanBin 4 →
    // ceil(5/4) = 2 output channels everywhere, in main AND the SPW
    val m = spark.read.parquet(s"$out/main")
      .groupBy("DATA_DESC_ID")
      .agg(countDistinct(size(col("DATA"))).as("n_shapes"),
        max(size(col("DATA"))).as("nchan_out"))
      .orderBy("DATA_DESC_ID").collect()
    assert(m.forall(_.getAs[Int]("nchan_out") == 2))
    assert(m.forall(_.getAs[Long]("n_shapes") == 1))
    val spwOut = spark.read.parquet(s"$out/SPECTRAL_WINDOW")
      .select("NUM_CHAN").as[Int].collect().toSeq
    assert(spwOut == Seq(2, 2))
    // WEIGHT_SPECTRUM sliced in lockstep with DATA
    val wsBad = spark.read.parquet(s"$out/main")
      .filter(size(col("WEIGHT_SPECTRUM")) =!= size(col("DATA"))).count()
    assert(wsBad == 0)
  }

  test("absent WEIGHT_SPECTRUM falls back to broadcast WEIGHT exactly") {
    // the reference's try/except optional-column path (averaging.py:
    // 241-248): without WS the kernel weights each (chan,corr) cell by
    // the per-corr WEIGHT. Constructing WS := WEIGHT broadcast over chan
    // must therefore reproduce the no-WS result bit-for-bit.
    val noWs = Timechannel.averagedMain(
      main.drop("WEIGHT_SPECTRUM", "SIGMA_SPECTRUM"), args(60000.0, 4))
    assert(!noWs.columns.contains("WEIGHT_SPECTRUM") &&
      !noWs.columns.contains("SIGMA_SPECTRUM"))
    val broadcastWs = Timechannel.averagedMain(
      main.drop("SIGMA_SPECTRUM")
        .withColumn("WEIGHT_SPECTRUM",
          transform(col("DATA"), _ => col("WEIGHT"))),
      args(60000.0, 4))
    val key = Seq("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER",
      "ANTENNA1", "ANTENNA2", "TIME")
    val j = noWs.as("a").join(
      broadcastWs.select((key.map(col) :+ col("DATA").as("DATA_B")): _*).as("b"), key)
    assert(j.count() == noWs.count())
    assert(j.filter(col("DATA") =!= col("DATA_B")).count() == 0,
      "WEIGHT fallback diverges from explicit broadcast WEIGHT_SPECTRUM")
  }

  test("multiple data columns average in ONE pass with independent results") {
    val multi = Timechannel.averagedMain(main, args(60000.0, 4).copy(
      dataCols = Seq("DATA" -> "OUT_A", "CORRECTED_DATA" -> "OUT_B")))
    assert(multi.columns.contains("OUT_A") && multi.columns.contains("OUT_B"))
    val key = Seq("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER",
      "ANTENNA1", "ANTENNA2", "TIME")
    def single(from: String) = Timechannel.averagedMain(main,
      args(60000.0, 4).copy(dataCols = Seq(from -> "X")))
      .select((key.map(col) :+ col("X")): _*)
    val a = multi.as("m").join(single("DATA").as("s"), key)
      .filter(col("OUT_A") =!= col("X")).count()
    val b = multi.as("m").join(single("CORRECTED_DATA").as("s"), key)
      .filter(col("OUT_B") =!= col("X")).count()
    assert(a == 0 && b == 0, "multi-column pass differs from single-column runs")
  }

  test("-rc/-grc bound written chunk sizes (maxRecordsPerFile mapping)") {
    val out = "/tmp/graft_test/tc_rowchunks"
    Timechannel.run(spark, graft.ms.SyntheticMs.root, out,
      args(60000.0, 4).copy(force = true, rowChunks = 100, groupRowChunks = 2))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$out/main"))
      .toArray.toSeq.map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty)
    // every written file must hold <= rowChunks * groupRowChunks rows
    val over = files.count(f => spark.read.parquet(f).count() > 200)
    assert(over == 0, s"$over files exceed the -rc*-grc row bound")
    // and the bound actually bit: output rows >> 200 forces multiple files
    assert(files.length > 1)
  }

  test("runningBins packs gapped sampling by accumulated INTERVAL, grid by wall time") {
    // one baseline, TIMEs 0/50/60 with INTERVAL 10, bin = 20 s:
    //  - grid (t0-anchored): floor(t/20) = 0, 2, 3 → three bins
    //  - running (accumulate-until-full, the reference kernel's walk):
    //    pre-row cumsum = 0, 10, 20 → bins 0, 0, 1 → TWO bins — the
    //    gap does not open a new bin until 20 s of integration accrue
    import VisAggregator.Cpx
    val rows = Seq(0.0, 50.0, 60.0).map { t =>
      (t, 10.0, t, 10.0, 1, 2, 0, 0, 0, Seq(0.0, 0.0, 0.0), Seq(1.0),
        Seq(1.0), Seq(Seq(Cpx(1f, 0f))), Seq(Seq(false)), false)
    }.toDF("TIME", "INTERVAL", "TIME_CENTROID", "EXPOSURE", "ANTENNA1",
      "ANTENNA2", "FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER", "UVW",
      "WEIGHT", "SIGMA", "DATA", "FLAG", "FLAG_ROW")
    def run(running: Boolean) = Timechannel.averagedMain(rows,
      args(20.0, 1).copy(runningBins = running)).count()
    assert(run(running = false) == 3)
    assert(run(running = true) == 2)
  }

  test("output channel counts follow the bin size with ragged tails") {
    val out = Timechannel.averagedMain(main, args(60000.0, 3))
    // 16 chans -> ceil(16/3)=6; 32 -> ceil(32/3)=11
    val counts = out.groupBy("DATA_DESC_ID")
      .agg(countDistinct(size(col("DATA"))).as("n_shapes"),
        max(size(col("DATA"))).as("nchan_out"))
      .orderBy("DATA_DESC_ID").collect()
    assert(counts(0).getAs[Int]("nchan_out") == 6)
    assert(counts(1).getAs[Int]("nchan_out") == 11)
    assert(counts.forall(_.getAs[Long]("n_shapes") == 1))
  }
}
