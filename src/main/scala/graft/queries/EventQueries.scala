package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.EventOps

/** Event-log analytics entries (sessionization, as-of join) over the
  * `events` table. Exactness: `ts` is parquet `timestamp[us]`
  * (TIMESTAMP_NTZ) and [[EventOps.epochUs]] recovers its integer
  * microseconds exactly (== DuckDB `epoch_us(ts)`); `value` sits on a
  * 1/100 grid → cents are integer-lifted. All session/attribution
  * arithmetic is pure integer.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  /** 4-hour inactivity gap (micros). */
  private val GapSeconds = 14400L

  /** 4-hour funnel conversion window (micros) — ev4_funnel_window. */
  private val FunnelGapUs = 14400L * 1000000L

  val queries: Map[String, Q] = Map(
    // Gap-based sessionization via the NATIVE session_window
    // aggregation (one shuffle on user_id; per-user ordinal window).
    "ev1_sessionize" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"),
        EventOps.eventTs(col("ts")).as("TS"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      EventOps.sessionize(ev, GapSeconds)
    }),

    // As-of join: latest click at-or-before each purchase, per user —
    // the union-tag + running-last composition (no join node).
    "aj1_asof_join" -> ((s, d) =>
      EventOps.asofAttribute(Tables.events(s, d), "click", "purchase")
        .select(
          col("user_id"),
          col("event_id").as("purchase_id"),
          EventOps.epochUs(col("ts")).as("purchase_us"),
          coalesce(col("match_id"), lit(-1L)).as("click_id"),
          coalesce(EventOps.epochUs(col("match_ts")), lit(-1L)).as("click_us"))),

    // Ordered-step conversion funnel signup → click → purchase: first
    // reach-time of each step strictly after the previous step's first
    // reach — one user-keyed shuffle, N running-min windows over the
    // same sort, never N self-joins.
    "ev3_funnel" -> ((s, d) =>
      EventOps.funnel(Tables.events(s, d),
        Seq("signup", "click", "purchase"))),

    // Same funnel under a 4-hour conversion window: step k counts only
    // within the window of step k-1's first completion — the constraint
    // every production funnel report carries. Identical plan shape (the
    // gap is a predicate inside the same window projections); users who
    // convert slowly drop a stage relative to ev3_funnel.
    "ev4_funnel_window" -> ((s, d) =>
      EventOps.funnel(Tables.events(s, d),
        Seq("signup", "click", "purchase"),
        maxStepGapUs = Some(FunnelGapUs))),

    // Weekly cohort retention over the full event log — first-seen-day
    // cohorts, 7-day activity buckets, distinct active users per cell.
    "ev5_retention" -> ((s, d) =>
      EventOps.retention(Tables.events(s, d), 7)),

    // Semi-structured extraction: pull a typed field out of the JSON
    // `props` column and aggregate it. get_json_object is a codegen'd
    // path expression — the scan-speed way to read JSON-in-a-string
    // without a parse-to-struct stage; the projection stays narrow and
    // the single shuffle is the (event_type) aggregate.
    // ORACLE CONTRACT: props.k is integer-valued (TESTDATA generates
    // {"k": <int>}). On non-integral values the engines diverge —
    // Spark's string→long cast NULLs 1.5/"x", DuckDB's CAST(... AS
    // BIGINT) rounds or errors — so the integer-only assumption is part
    // of the entry's contract, not an accident of the data.
    "ev2_json_agg" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max")))
  )

  /** Gap-and-island mirror of [[EventOps.sessionize]]: Spark's
    * session_window MERGES events exactly `gap` apart, so the break
    * condition is strictly `diff > gap`. Shared with the streaming
    * sessionizer entry (st3), which must reproduce it bit-for-bit.
    */
  val sessionizeOracleSql: String =
    s"""WITH m AS (
          SELECT user_id, epoch_us(ts) AS tu,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts)
                      > ${GapSeconds * 1000000L} THEN 1 ELSE 0 END AS brk
          FROM events),
        g AS (
          SELECT user_id, tu, cents,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY tu
                                ROWS UNBOUNDED PRECEDING) AS sess
          FROM m)
        SELECT user_id, CAST(sess AS BIGINT) AS session_id,
               CAST(min(tu) AS BIGINT) AS s_start_us,
               CAST(max(tu) AS BIGINT) AS s_end_us,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS value_cents
        FROM g GROUP BY user_id, sess"""

  val oracleSql: Map[String, String] = Map(
    "ev1_sessionize" -> sessionizeOracleSql,

    // DuckDB's native ASOF JOIN is the independent ground truth for
    // the window composition ((user_id, ts) is unique → deterministic).
    "aj1_asof_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
                CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
                coalesce(c.event_id, -1) AS click_id,
                coalesce(CAST(epoch_us(c.ts) AS BIGINT), -1) AS click_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts""",

    // NULL props / missing key fall out of count(k)/sum(k) identically
    // on both engines (aggregate null-skipping).
    // Same running-min chain: step k's candidates are rows strictly
    // after step k-1's running minimum at that row; chained CTEs mirror
    // the chained window projections. Pure integer microseconds.
    "ev3_funnel" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS tu, event_type
           FROM events
           WHERE event_type IN ('signup', 'click', 'purchase')),
         r0 AS (
           SELECT *, min(CASE WHEN event_type = 'signup' THEN tu END)
                       OVER w AS _r0
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                        ROWS UNBOUNDED PRECEDING)),
         r1 AS (
           SELECT *, min(CASE WHEN event_type = 'click'
                               AND _r0 IS NOT NULL AND tu > _r0
                              THEN tu END) OVER w AS _r1
           FROM r0
           WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                        ROWS UNBOUNDED PRECEDING)),
         r2 AS (
           SELECT *, min(CASE WHEN event_type = 'purchase'
                               AND _r1 IS NOT NULL AND tu > _r1
                              THEN tu END) OVER w AS _r2
           FROM r1
           WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                        ROWS UNBOUNDED PRECEDING)),
         a AS (
           SELECT user_id,
                  CAST(min(_r0) AS BIGINT) AS s1_us,
                  CAST(min(_r1) AS BIGINT) AS s2_us,
                  CAST(min(_r2) AS BIGINT) AS s3_us
           FROM r2 GROUP BY 1)
         SELECT user_id, s1_us, s2_us, s3_us,
                CAST((CASE WHEN s1_us IS NOT NULL THEN 1 ELSE 0 END)
                   + (CASE WHEN s2_us IS NOT NULL THEN 1 ELSE 0 END)
                   + (CASE WHEN s3_us IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS funnel_stage
         FROM a WHERE s1_us IS NOT NULL""",

    // Pure integer day/bucket arithmetic (epoch_us // 86400e6) — no
    // week-start or timezone conventions for the engines to diverge on.
    "ev5_retention" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
         c AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1)
         SELECT c.cohort_day,
                CAST((e.d - c.cohort_day) // 7 AS BIGINT) AS bucket_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
         FROM e JOIN c USING (user_id)
         GROUP BY 1, 2""",

    // ev3's chain with the conversion-window predicate added to each
    // step's CASE — the gap literal must match FunnelGapUs.
    "ev4_funnel_window" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS tu, event_type
           FROM events
           WHERE event_type IN ('signup', 'click', 'purchase')),
         r0 AS (
           SELECT *, min(CASE WHEN event_type = 'signup' THEN tu END)
                       OVER w AS _r0
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                        ROWS UNBOUNDED PRECEDING)),
         r1 AS (
           SELECT *, min(CASE WHEN event_type = 'click'
                               AND _r0 IS NOT NULL AND tu > _r0
                               AND tu <= _r0 + 14400000000
                              THEN tu END) OVER w AS _r1
           FROM r0
           WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                        ROWS UNBOUNDED PRECEDING)),
         r2 AS (
           SELECT *, min(CASE WHEN event_type = 'purchase'
                               AND _r1 IS NOT NULL AND tu > _r1
                               AND tu <= _r1 + 14400000000
                              THEN tu END) OVER w AS _r2
           FROM r1
           WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                        ROWS UNBOUNDED PRECEDING)),
         a AS (
           SELECT user_id,
                  CAST(min(_r0) AS BIGINT) AS s1_us,
                  CAST(min(_r1) AS BIGINT) AS s2_us,
                  CAST(min(_r2) AS BIGINT) AS s3_us
           FROM r2 GROUP BY 1)
         SELECT user_id, s1_us, s2_us, s3_us,
                CAST((CASE WHEN s1_us IS NOT NULL THEN 1 ELSE 0 END)
                   + (CASE WHEN s2_us IS NOT NULL THEN 1 ELSE 0 END)
                   + (CASE WHEN s3_us IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS funnel_stage
         FROM a WHERE s1_us IS NOT NULL""",

    // Integer-only contract (see the Spark side): Spark NULLs a
    // non-integral k where DuckDB's CAST rounds/errors — the mirror
    // holds only while props.k is an integer, which TESTDATA declares.
    "ev2_json_agg" ->
      """SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS n_with_k,
                CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS k_sum,
                CAST(min(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS k_min,
                CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                  AS BIGINT) AS k_max
         FROM events GROUP BY 1"""
  )
}
