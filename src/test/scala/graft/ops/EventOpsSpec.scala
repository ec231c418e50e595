package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Sketches, TextOps}

/** Value-level semantics of the event-analytics operators, including
  * the batch ≡ streaming sessionizer equivalence on real fixture data.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("sessionize: exactly-gap events merge, beyond-gap events split") {
    // u1: 0s, 10s, 20s with a 10s gap — one session (verified Spark
    // session_window semantics: merge at exactly gap).
    // u2: 0s then 10s + 1µs — two sessions.
    val ev = Seq(
      (1L, 0L, 5L), (1L, 10000000L, 7L), (1L, 20000000L, 9L),
      (2L, 0L, 1L), (2L, 10000001L, 2L))
      .toDF("user_id", "us", "cents")
      .select(col("user_id"), timestamp_micros(col("us")).as("TS"),
        col("cents"))
    val out = EventOps.sessionize(ev, 10L)
      .select("user_id", "session_id", "s_start_us", "s_end_us",
        "n_events", "value_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 20000000L, 3L, 21L),
      (2L, 0L, 0L, 0L, 1L, 1L),
      (2L, 1L, 10000001L, 10000001L, 1L, 2L)))
  }

  test("asofAttribute: inclusive tie, no-prior-left null, latest wins") {
    val ev = Seq(
      // user 1: purchase before any click → null match
      (1L, 50L, 3L, "purchase"),
      // click and purchase at the SAME ts → click attributed (inclusive)
      (1L, 100L, 1L, "click"), (1L, 100L, 2L, "purchase"),
      // later purchase picks the LATEST prior click, not the first
      (1L, 200L, 4L, "click"), (1L, 300L, 5L, "purchase"),
      // other types are ignored entirely
      (1L, 250L, 6L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.asofAttribute(ev, "click", "purchase")
      .select(col("event_id"), coalesce(col("match_id"), lit(-1L)))
      .as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((2L, 1L), (3L, -1L), (5L, 4L)))
  }

  test("streaming sessionizer ≡ batch session_window on the fixture") {
    val batch = graft.queries.EventQueries.queries("ev1_sessionize")(spark, sfDir)
    val stream = graft.queries.StreamingQueries.queries("st3_stream_sessions")(spark, sfDir)
    val cols = Seq("user_id", "session_id", "s_start_us", "s_end_us",
      "n_events", "value_cents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*)
        .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val b = rows(batch)
    assert(b.nonEmpty && b == rows(stream))
  }

  test("streaming funnel ≡ batch funnel on the fixture") {
    val batch = graft.queries.EventQueries.queries("ev3_funnel")(spark, sfDir)
    val stream = graft.queries.StreamingQueries.queries("st8_stream_funnel")(spark, sfDir)
    val cols = Seq("user_id", "s1_us", "s2_us", "s3_us", "funnel_stage")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(c => coalesce(col(c), lit(-1L))): _*)
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val b = rows(batch)
    assert(b.nonEmpty && b == rows(stream))
  }

  test("retention: first-seen cohorts, bucket offsets, distinct actives") {
    val day = 86400000000L
    val ev = Seq(
      // u1: first seen day 0, active again days 8 (bucket 1) and 20 (2)
      (1L, 0L), (1L, 8 * day), (1L, 20 * day),
      // u2: joins day 1 (same week-0 cell as its own cohort), twice in
      // bucket 0 — distinct count must collapse the repeat
      (2L, 1 * day), (2L, 2 * day),
      // u3: also cohort day 0 — shares u1's cells
      (3L, 0L), (3L, 9 * day))
      .toDF("user_id", "us")
      .select(col("user_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val r = EventOps.retention(ev, 7).orderBy("cohort_day", "bucket_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 0L, 2L),  // u1+u3 day-0 activity
      (0L, 1L, 2L),  // u1 day 8, u3 day 9
      (0L, 2L, 1L),  // u1 day 20
      (1L, 0L, 1L))) // u2 both events inside its own bucket 0
  }

  test("funnel: strict ordering, ties excluded, pre-step events ignored") {
    def e(id: Long, u: Long, tUs: Long, t: String) = (id, u, tUs, t)
    val ev = Seq(
      e(1, 1, 10, "signup"), e(2, 1, 20, "click"), e(3, 1, 30, "purchase"),
      // user 2: click BEFORE signup doesn't count; click AT signup time
      // (strict >) doesn't count; purchase without a qualifying click
      // doesn't count
      e(4, 2, 5, "click"), e(5, 2, 10, "signup"), e(6, 2, 10, "click"),
      e(7, 2, 15, "purchase"),
      // user 3: never signs up -> absent from the funnel
      e(8, 3, 10, "click"), e(9, 3, 20, "purchase"),
      // user 4: out-of-order purchase before the first qualifying click
      // is skipped; the later one counts
      e(10, 4, 10, "signup"), e(11, 4, 15, "purchase"), e(12, 4, 20, "click"),
      e(13, 4, 25, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
      // TIMESTAMP_NTZ, matching events.parquet's production type (the
      // UTC session tz makes the LTZ→NTZ wall-clock cast the identity)
      // so epochUs's NTZ→instant path is the one under test.
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
    val r = EventOps.funnel(ev, Seq("signup", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("funnel_stage"),
        Option(x.get(x.fieldIndex("s2_us"))), Option(x.get(x.fieldIndex("s3_us")))))
    assert(r.toSeq == Seq(
      (1L, 3L, Some(20L), Some(30L)),
      (2L, 1L, None, None),
      (4L, 3L, Some(20L), Some(25L))))
  }

  test("funnel conversion window: slow steps drop out, chain anchors on first completion") {
    def e(id: Long, u: Long, tUs: Long, t: String) = (id, u, tUs, t)
    val ev = Seq(
      // u1 converts fast: every step within 5µs of the previous
      e(1, 1, 10, "signup"), e(2, 1, 14, "click"), e(3, 1, 18, "purchase"),
      // u2 is the planted slow path: click lands 6µs after signup
      // (outside the 5µs window) — stage stops at 1 even though a
      // purchase follows; without the window u2 would reach stage 3
      e(4, 2, 10, "signup"), e(5, 2, 16, "click"), e(6, 2, 18, "purchase"),
      // u3: the FIRST in-window click (t=13) anchors the purchase
      // window; the purchase at 19 is outside (13+5), so stage 2 —
      // proving the chain anchors on first completion, not "any pair"
      e(7, 3, 10, "signup"), e(8, 3, 13, "click"), e(9, 3, 14, "click"),
      e(10, 3, 19, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
    def stages(gapUs: Option[Long]) =
      EventOps.funnel(ev, Seq("signup", "click", "purchase"), gapUs)
        .orderBy("user_id").collect()
        .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("funnel_stage")))
        .toSeq
    assert(stages(Some(5L)) == Seq((1L, 3L), (2L, 1L), (3L, 2L)))
    // the unconstrained funnel converts all three — the window is what
    // excluded the slow user, not the data
    assert(stages(None) == Seq((1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("grouped HLL: per-group estimates within 20% of known distincts") {
    // group A: 2000 distinct values; group B: 100 — estimates must
    // track each group independently
    val df = ((0 until 2000).map(i => ("A", s"a_$i")) ++
      (0 until 100).map(i => ("B", s"b_$i")) ++
      (0 until 500).map(i => ("B", s"b_${i % 100}"))) // dups don't move B
      .toDF("grp0", "v")
    val r = Sketches.hllGrouped(df, col("grp0"), col("v"), 8)
      .collect().map(x => x.getAs[String]("grp") ->
        (x.getAs[Double]("hll_raw_est"), x.getAs[Long]("n_zero_registers")))
      .toMap
    // A (n >> m): the raw estimator applies directly
    assert(math.abs(r("A")._1 - 2000) / 2000.0 < 0.2, s"A est ${r("A")._1}")
    // B (n << m): raw HLL over-reads by design; the documented
    // caller-side small-range correction is linear counting over the
    // published zero-register count
    val estB = 256.0 * math.log(256.0 / r("B")._2)
    assert(math.abs(estB - 100) / 100.0 < 0.2, s"B linear-count est $estB")
  }

  test("grouped quantiles: hand-computed bin read-off per group") {
    val df = ((0 until 100).map(i => ("A", i.toLong)) ++
      (0 until 7).map(_ => ("B", 5L))).toDF("g", "v")
    val r = Sketches.histogramGroupedQuantiles(df, col("g"), col("v"),
        0L, 100L, 10, Seq((1, 2), (9, 10)))
      .collect()
      .map(x => (x.getAs[String]("grp"), x.getAs[Long]("num")) ->
        x.getAs[Long]("q_est")).toMap
    // A: uniform 0..99 → p50 rank 50 lands in bin [40,50), p90 in [80,90)
    assert(r(("A", 1L)) == 40L && r(("A", 9L)) == 80L)
    // B: constant 5 → every quantile reads bin [0,10)
    assert(r(("B", 1L)) == 0L && r(("B", 9L)) == 0L)
    assert(r.size == 4)
  }

  test("KMV sketch: estimate within 15% of a known distinct count") {
    val n = 5000
    val toks = (0 until n).map(i => s"tok_$i").toDF("tok")
    val row = Sketches.kmvDistinct(
      toks, TextOps.hash60(concat(lit("kmv|"), col("tok"))), 256)
      .select("n_exact", "k_eff", "kmv_est")
      .as[(Long, Long, Long)].head()
    assert(row._1 == n) // md5-60bit collision-free at this size
    assert(row._2 == 256L)
    assert(math.abs(row._3 - n).toDouble / n < 0.15,
      s"KMV estimate ${row._3} too far from $n")
  }
}
