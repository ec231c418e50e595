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
}
