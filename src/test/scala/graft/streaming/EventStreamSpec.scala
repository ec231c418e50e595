package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics driven through MemoryStream → memory sink:
  * window contents, incremental updates, and stateful running totals.
  */
class EventStreamSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("windowed aggregation accumulates per event-time window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.windowedStats(in.toDF(), "10 seconds", "30 seconds")
      .writeStream.format("memory").queryName("win1").outputMode("complete")
      .start()
    try {
      in.addData(
        EventStream.Event(ts(100), 1, 2.0),
        EventStream.Event(ts(104), 1, 3.0),
        EventStream.Event(ts(112), 1, 5.0))
      q.processAllAvailable()
      val r1 = spark.table("win1")
        .select("user_id", "n_events", "sum_value")
        .orderBy("win_start").collect()
      assert(r1.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((1L, 2L, 5.0), (1L, 1L, 5.0)))

      // second micro-batch lands in the first window (within watermark)
      in.addData(EventStream.Event(ts(105), 1, 10.0))
      q.processAllAvailable()
      val r2 = spark.table("win1").orderBy("win_start").collect()
      assert(r2(0).getAs[Long]("n_events") == 3)
      assert(r2(0).getAs[Double]("sum_value") == 15.0)
    } finally q.stop()
  }

  test("streaming windows equal the batch groupBy-window on the same data") {
    implicit val sq = spark.sqlContext
    val rows = (0 until 50).map(i =>
      EventStream.Event(ts(1000 + i * 7), i % 3, i * 0.5))
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.windowedStats(in.toDF(), "30 seconds", "1 minute")
      .writeStream.format("memory").queryName("winEq").outputMode("complete")
      .start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("winEq")
      val batch = rows.toDF("ts", "user_id", "value")
        .groupBy(window(col("ts"), "30 seconds"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("user_id"),
          col("n_events"), col("sum_value"))
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.runningTotals(in.toDS())
      .writeStream.format("memory").queryName("tot1").outputMode("update")
      .start()
    try {
      in.addData(EventStream.Event(ts(1), 7, 1.5),
        EventStream.Event(ts(2), 7, 2.5), EventStream.Event(ts(3), 9, 4.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(ts(4), 7, 6.0))
      q.processAllAvailable()
      val last = spark.table("tot1")
        .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
        .orderBy("user_id").collect()
      assert(last.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((7L, 3L, 10.0), (9L, 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming exact-dedup merges duplicate content across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = EventStream.exactClusters(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup1")
      .outputMode("complete").start()
    try {
      in.addData((10L, "aaa"), (3L, "bbb"))
      q.processAllAvailable()
      // batch 2 carries a copy of batch-1 content with a SMALLER id:
      // the state store must merge count and re-minimize the keeper
      in.addData((5L, "aaa"), (7L, "ccc"))
      q.processAllAvailable()
      val r = spark.table("dedup1").orderBy("keeper").collect()
        .map(x => (x.getAs[Long]("keeper"), x.getAs[Long]("n_copies"))).toSeq
      assert(r == Seq((3L, 1L), (5L, 2L), (7L, 1L)))
    } finally q.stop()
  }

  test("streaming CMS sketch merges across micro-batches to the batch matrix") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val sk = graft.pipeline.Sketches.cmsSketch(in.toDF().toDF("tok"),
      col("tok"), 3, 64)
    val q = sk.writeStream.format("memory").queryName("cms1")
      .outputMode("complete").start()
    try {
      in.addData("alpha", "beta", "alpha")
      q.processAllAvailable()
      in.addData("alpha", "gamma") // same cells must ADD, not replace
      q.processAllAvailable()
      val streamed = spark.table("cms1")
      val batch = graft.pipeline.Sketches.cmsSketch(
        Seq("alpha", "beta", "alpha", "alpha", "gamma").toDF("tok"),
        col("tok"), 3, 64)
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0, "streaming-only cells")
      assert(batch.exceptAll(streamed).count() == 0, "batch-only cells")
      // 'alpha' reads back >= 3 from every row of the sketch
      assert(spark.table("cms1").filter(
        col("cell") === pmod(graft.pipeline.TextOps.hash60(
          concat(lit("cms0|"), lit("alpha"))), lit(64L)) &&
        col("seed") === 0).head().getAs[Long]("cnt") >= 3L)
    } finally q.stop()
  }

  test("streaming HLL registers merge across micro-batches to the batch table") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val regs = graft.pipeline.Sketches.hllRegisters(
      in.toDF().toDF("tok"), col("tok"), 8)
    val q = regs.writeStream.format("memory").queryName("hll1")
      .outputMode("complete").start()
    try {
      in.addData("alpha", "beta", "alpha")
      q.processAllAvailable()
      in.addData("gamma", "alpha", "delta") // max(rho) must MERGE, not replace
      q.processAllAvailable()
      val streamed = spark.table("hll1")
      val batch = graft.pipeline.Sketches.hllRegisters(
        Seq("alpha", "beta", "alpha", "gamma", "alpha", "delta").toDF("tok"),
        col("tok"), 8)
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0, "streaming-only registers")
      assert(batch.exceptAll(streamed).count() == 0, "batch-only registers")
    } finally q.stop()
  }

  test("stream-static decontam join flags exactly the batch overlap set") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val bench = Seq((100L, "secret eval question here")).toDF("doc_id", "text")
    val benchGrams = bench.select(explode(array_distinct(
        graft.expressions.TokenGramHash(col("text"), 2))).as("gram"))
      .distinct()
    val in = MemoryStream[(Long, String)]
    val flagged = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), explode(array_distinct(
        graft.expressions.TokenGramHash(col("text"), 2))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    val q = flagged.writeStream.format("memory").queryName("decontam1")
      .outputMode("complete").start()
    try {
      in.addData((1L, "totally clean document"),
        (2L, "contains secret eval material")) // shares gram "secret eval"
      q.processAllAvailable()
      in.addData((3L, "the eval question here is leaked")) // 2 shared grams
      q.processAllAvailable()
      val r = spark.table("decontam1").orderBy("doc_id").collect()
        .map(x => (x.getAs[Long]("doc_id"),
          x.getAs[Long]("n_shared_grams"))).toSeq
      assert(r == Seq((2L, 1L), (3L, 2L)),
        s"stream-static flag set diverged: $r")
      // must equal the batch operator on the union of all batches
      val corpus = Seq((1L, "totally clean document"),
        (2L, "contains secret eval material"),
        (3L, "the eval question here is leaked")).toDF("doc_id", "text")
      val batch = graft.pipeline.Dedup.contaminated(corpus, bench, 2)
        .orderBy("doc_id").collect()
        .map(x => (x.getAs[Long]("doc_id"),
          x.getAs[Long]("n_shared_grams"))).toSeq
      assert(r == batch, s"stream $r != batch $batch")
    } finally q.stop()
  }

  test("watermark: drops late rows, keeps within-delay rows, holds open windows") {
    // the st6 semantics at hand-built scale (1h windows, 2h delay):
    //  b1: t=1800 (w[0,3600)), t=22320 → watermark 22320-7200 = 15120
    //  b2: t=2160  — late, its window end 3600 <= 15120: DROPPED
    //      t=15840 — late but its window [14400,18000) is open: KEPT
    //      t=30600 — fresh, watermark advances to 23400
    // append mode emits exactly the windows the watermark passed:
    // [0,3600) with n=1 (late copy dropped) and [14400,18000) with the
    // within-delay row; [21600,25200) and [28800,32400) stay held.
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val windowed = in.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "3600 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("user_id"), col("n_events"))
    val q = windowed.writeStream.format("memory").queryName("wm1")
      .outputMode("append").start()
    try {
      in.addData(EventStream.Event(ts(1800), 1, 1.0),
        EventStream.Event(ts(22320), 1, 1.0))
      q.processAllAvailable()
      in.addData(EventStream.Event(ts(2160), 1, 1.0),
        EventStream.Event(ts(15840), 1, 1.0),
        EventStream.Event(ts(30600), 1, 1.0))
      q.processAllAvailable()
      // the final eviction arrives in a no-data micro-batch after the
      // watermark advance — poll briefly for it
      def rows() = spark.table("wm1").orderBy("win_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val deadline = System.currentTimeMillis() + 20000
      while (rows().length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows() == Seq((0L, 1L, 1L), (14400L, 1L, 1L)),
        s"watermark semantics violated: ${rows()}")
      // without the watermark the late copy lands in w0 — n would be 2;
      // n=1 above proves the DROP, not an accident of the data
      val noWm = Seq(1800L, 22320L, 2160L, 15840L, 30600L)
        .map(t => EventStream.Event(ts(t), 1, 1.0))
        .toDF().groupBy(window(col("ts"), "3600 seconds")).count()
        .filter(unix_timestamp(col("window.start")) === 0)
        .head().getAs[Long]("count")
      assert(noWm == 2L)
    } finally q.stop()
  }

  test("stream-stream interval join: cross-batch match emits, watermark evicts state") {
    implicit val sq = spark.sqlContext
    val cIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val pIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val clicks = cIn.toDF().toDF("CTS", "user_id", "click_id")
      .withWatermark("CTS", "10 seconds")
    val purchases = pIn.toDF().toDF("PTS", "p_user_id", "purchase_id")
      .withWatermark("PTS", "10 seconds")
    val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("PTS") >= col("CTS") &&
          col("PTS") <= col("CTS") + expr("INTERVAL 30 seconds"))
      .select("click_id", "purchase_id")
    val q = joined.writeStream.format("memory").queryName("ssj1")
      .outputMode("append").start()
    try {
      cIn.addData((ts(100), 1L, 11L))
      q.processAllAvailable()
      assert(spark.table("ssj1").count() == 0, "no match may emit yet")
      // the matching purchase arrives a micro-batch LATER — the click
      // must still be buffered in the join state store
      pIn.addData((ts(120), 1L, 21L))
      q.processAllAvailable()
      val m = spark.table("ssj1").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(m.toSeq == Seq((11L, 21L)), "cross-batch match must emit")
      // sweep the watermark far past the join horizon: the buffered
      // t=100/t=120 rows must be EVICTED (state bounded by the
      // delay+window horizon, not stream length)
      cIn.addData((ts(1000), 2L, 12L)); pIn.addData((ts(1000), 3L, 22L))
      q.processAllAvailable()
      def stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal.toLong).sum
      val deadline = System.currentTimeMillis() + 20000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        ok = stateRows <= 2 // only the two live t=1000 rows may remain
        if (!ok) Thread.sleep(200)
      }
      assert(ok, s"join state not evicted: $stateRows rows still buffered")
      assert(spark.table("ssj1").count() == 1, "no spurious matches")
    } finally q.stop()
  }

  test("streaming funnel: one user-keyed state operator, vector-sized state, cleared on flush") {
    // st8's scale story, locked into the suite (VERDICT r9 #4): the
    // funnel is ONE flatMapGroupsWithState over the user key — a single
    // keyed exchange, no join, no range partitioning — and its state is
    // one fixed-width reach vector per LIVE user (never the event log),
    // removed at flush.
    import EventStream.{FunnelEvent, FunnelOut}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = EventStream.funnel(in.toDS(), 3)
      .writeStream.format("memory").queryName("stf_plan")
      .outputMode("append").start()
    try {
      in.addData(
        FunnelEvent(1, 1, 100, 0, flush = false),
        FunnelEvent(2, 2, 100, 0, flush = false))
      q.processAllAvailable()
      val so = q.lastProgress.stateOperators
      assert(so.length == 1, s"funnel must run exactly one state operator, got ${so.length}")
      assert(so(0).operatorName.toLowerCase.contains("flatmapgroupswithstate"),
        s"state operator is ${so(0).operatorName}")
      assert(so(0).numRowsTotal == 2, "state = one vector per live user")
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf))(q.explain())
      val p = buf.toString
      assert(p.contains("FlatMapGroupsWithState"), s"plan:\n$p")
      assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1,
        s"funnel stream must shuffle once on the user key:\n$p")
      assert(!p.contains("Join"), s"funnel stream must not plan a join:\n$p")
      assert(!p.contains("rangepartitioning") && !p.contains("Exchange SinglePartition"),
        s"funnel stream must not funnel through one partition or sort globally:\n$p")
      // advancing a user's steps must not grow state (vector is in place)
      in.addData(FunnelEvent(1, 3, 200, 1, flush = false))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 2,
        "advancing a step must not add state rows")
      // flush sentinels emit the final vectors and CLEAR the store
      in.addData(
        FunnelEvent(1, 9, 1000000, 0, flush = true),
        FunnelEvent(2, 10, 1000000, 0, flush = true))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 0,
        "flushed users must leave no state behind")
      assert(spark.table("stf_plan").count() == 2, "both users emitted")
    } finally q.stop()
  }

  test("streaming retention: cohort fixed by first event, buckets merge across batches, flush clears") {
    import EventStream.RetEvent
    implicit val sq = spark.sqlContext
    val day = 86400000000L
    val in = MemoryStream[RetEvent]
    val q = EventStream.retention(in.toDS(), 7)
      .writeStream.format("memory").queryName("str_plan")
      .outputMode("append").start()
    try {
      in.addData(RetEvent(1, 10 * day, flush = false))
      q.processAllAvailable()
      // a later batch adds day-24 activity: bucket (24-10)/7 = 2 joins
      // bucket 0 in the SAME user's state (cross-batch merge), cohort
      // stays the first-seen day
      in.addData(RetEvent(1, 24 * day + 5, flush = false))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1)
      in.addData(RetEvent(1, 0, flush = true))
      q.processAllAvailable()
      val r = spark.table("str_plan").collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("cohort_day") == 10)
      assert(r(0).getAs[scala.collection.Seq[Long]]("buckets").toSeq == Seq(0L, 2L))
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 0,
        "flushed user must leave no state behind")
    } finally q.stop()
  }

  test("streaming retention equals the batch ev5 matrix cell for cell") {
    val qs = graft.SparkEntry.queries
    val streamed = qs("st9_stream_retention")(spark, "/root/testdata/sf0.001")
    val batch = qs("ev5_retention")(spark, "/root/testdata/sf0.001")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0, "streaming-only cells")
    assert(batch.exceptAll(streamed).count() == 0, "batch-only cells")
  }

  test("streaming visibility averaging equals the batch kernel bit-for-bit") {
    // st2 streams the MS main table one file per micro-batch (bins span
    // batches → real state-store accumulation) and must reproduce the
    // batch A2 entry exactly.
    val qs = graft.SparkEntry.queries
    val streamed = qs("st2_stream_visavg")(spark, "")
    val batch = qs("ms_a2_chan_avg")(spark, "")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0, "streaming-only rows")
    assert(batch.exceptAll(streamed).count() == 0, "batch-only rows")
  }

  test("token quota: per-group counter carries across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventStream.QuotaDoc]
    val q = EventStream.tokenQuota(in.toDS(), Map("t" -> 100L), 10L)
      .writeStream.format("memory").queryName("quota1").outputMode("append")
      .start()
    try {
      // batch 1 arrives out of draw order: fold must sort by (drw, id)
      in.addData(
        EventStream.QuotaDoc("s", 1L, 5L, 4L),
        EventStream.QuotaDoc("s", 2L, 2L, 3L))
      q.processAllAvailable()
      // batch 2: cum carried at 7; doc 3 admitted (7 < 10), doc 4 not
      in.addData(
        EventStream.QuotaDoc("s", 3L, 9L, 5L),
        EventStream.QuotaDoc("s", 4L, 11L, 2L),
        EventStream.QuotaDoc("t", 5L, 1L, 60L))
      q.processAllAvailable()
      val out = spark.table("quota1")
        .select("doc_id", "source", "cum_before").orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(out == Seq((1L, "s", 3L), (2L, "s", 0L), (3L, "s", 7L),
        (5L, "t", 0L)))
    } finally q.stop()
  }

  test("streaming ANN serves the batch LSH index's exact top-k per probe") {
    val qs = graft.SparkEntry.queries
    val streamed = qs("st15_stream_ann")(spark, "/root/testdata/sf0.001")
    val batch = qs("pl_a2_ann_lsh")(spark, "/root/testdata/sf0.001")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0, "streaming-only hits")
    assert(batch.exceptAll(streamed).count() == 0, "batch-only hits")
  }

  test("streaming token quota equals the batch pl_s7 mixture row for row") {
    val qs = graft.SparkEntry.queries
    val streamed = qs("st14_stream_quota")(spark, "/root/testdata/sf0.001")
    val batch = qs("pl_s7_token_budget")(spark, "/root/testdata/sf0.001")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0, "streaming-only rows")
    assert(batch.exceptAll(streamed).count() == 0, "batch-only rows")
  }
}
