package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics operators (extension beyond reference parity —
  * the training-data side of the engine): gap-based sessionization and
  * an as-of join, both expressed as single-shuffle declarative plans.
  *
  * Scale notes (100 TB): both operators shuffle ONCE on `user_id` and
  * never buffer more than a running window frame per key.
  * Sessionization uses the native `session_window` aggregation (Spark
  * merges events exactly `gap` apart — verified: events at 0/10/20 s
  * with a 10 s gap form ONE session — so the equivalent gap-and-island
  * formulation breaks strictly on `diff > gap`). The as-of join is the
  * union-tag + running-`last` composition: no join node at all, so
  * there is nothing to skew — the classic MERGE-sort as-of plan.
  */
object EventOps {

  /** `events.ts` arrives as parquet `timestamp[us]` (Spark
    * TIMESTAMP_NTZ; the wall-clock IS the UTC instant by the TESTDATA
    * contract). Every harness pins `spark.sql.session.timeZone=UTC`,
    * so the NTZ→instant cast is exact and `unix_micros` recovers the
    * integer microseconds all session/bin arithmetic runs on — pure
    * integer space, no double rounding, matching DuckDB `epoch_us`.
    */
  def eventTs(c: Column): Column = c.cast("timestamp")

  /** Exact epoch microseconds of an event-time column (see [[eventTs]]). */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Gap-based sessions per user. Input contract: `user_id` (long),
    * `TS` (timestamp), `cents` (long, integer-lifted value). Output:
    * one row per (user_id, session_id) with `s_start_us`/`s_end_us`
    * (first/last event, epoch micros), `n_events`, `value_cents`.
    *
    * `session_window` end is last-event + gap, so the last-event time
    * is recovered exactly by subtracting the gap. The per-user ordinal
    * `session_id` comes from a user-partitioned window — bounded by
    * sessions-per-user, never a global sort.
    */
  def sessionize(ev: DataFrame, gapSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val sessions = ev
      .groupBy(session_window(col("TS"), s"$gapSeconds seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("s_start_us"),
        (unix_micros(col("session_window.end")) - gapUs).as("s_end_us"),
        col("n_events"),
        col("value_cents"))
    val w = Window.partitionBy("user_id").orderBy("s_start_us")
    sessions.withColumn("session_id", (row_number().over(w) - 1).cast("long"))
  }

  /** As-of join over one event log: attribute each `rightType` event to
    * the latest `leftType` event of the same user at or before it
    * (classic click→purchase attribution). Emits the `rightType` rows
    * (`user_id`, `event_id`, `ts`) with nullable `match_id`/`match_ts`.
    *
    * Composition instead of a join: union-tag both populations, one
    * window ordered by (ts, tag) — left sorts before right on ties, so
    * the match is inclusive (`match_ts <= ts`) — and a running
    * `last(..., ignoreNulls)` carries the latest left row forward.
    * (user_id, ts) is unique in the fixture, so ties never make the
    * carried value ambiguous.
    */
  def asofAttribute(events: DataFrame, leftType: String,
                    rightType: String): DataFrame = {
    val ev = events
      .where(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === rightType, 1).otherwise(0).as("tag"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("match_id",
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("match_ts",
        last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("match_id"), col("match_ts"))
  }

  /** Cohort retention — the activity matrix every event pipeline
    * reports next to funnels: users are cohorted by their FIRST-seen
    * day and each cell counts distinct users of cohort `cohort_day`
    * active in bucket `bucket_offset` (offset in `bucketDays`-day
    * buckets from the cohort day; day = epoch-micros div 86400e6, an
    * engine-neutral integer — no week-start or timezone conventions
    * to diverge on). Returns (`cohort_day`, `bucket_offset`,
    * `n_active`).
    *
    * Composition: the cohort day rides a user-partitioned running-min
    * window (no join back to the fact table), then one cell-keyed
    * distinct-count aggregate — two keyed shuffles total, nothing
    * broadcast, nothing driver-side. At 100 TB the distinct expansion
    * is bounded per cell by cohort size; cells are (days × offsets),
    * naturally balanced.
    */
  def retention(events: DataFrame, bucketDays: Int = 7): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    val w = Window.partitionBy("user_id")
    events
      .select(col("user_id"), epochUs(col("ts")).as("tu"))
      .withColumn("d", expr("tu div 86400000000"))
      .withColumn("cohort_day", min("d").over(w))
      .withColumn("bucket_offset", expr(s"(d - cohort_day) div $bucketDays"))
      .groupBy("cohort_day", "bucket_offset")
      .agg(countDistinct("user_id").as("n_active"))
  }

  /** Ordered-step funnel: per user, the timestamp of the first `steps(0)`
    * event, the first `steps(1)` event strictly AFTER it, the first
    * `steps(2)` strictly after that, … — the conversion-path measure
    * (signup → click → purchase) every event pipeline reports. Returns
    * (`user_id`, `s1_us` … `sN_us` nullable, `funnel_stage` = number of
    * steps completed); every user with at least one step-1 event appears.
    *
    * Composition, not self-joins: one user-keyed shuffle, then per step
    * a running-min window (the step-k candidate at a row qualifies iff
    * it is strictly after the step-(k-1) running min AT THAT ROW) and a
    * final per-user aggregation. N steps cost N window projections over
    * the SAME partitioning — Catalyst plans one Exchange + one Sort,
    * not N self-joins of the fact table.
    *
    * `maxStepGapUs` adds the conversion-window constraint real funnel
    * reporting uses ("step k within X of step k-1"): a step-k candidate
    * qualifies only inside `(_r(k-1), _r(k-1) + gap]`. The running min
    * of each step is its FIRST completion time (rows arrive in `tu`
    * order, so the prefix-min is set once and never lowered), so the
    * window anchors on the previous step's first completion — the
    * standard strict-chain funnel definition. Same plan shape: the gap
    * is one extra predicate per window projection, no new Exchange.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             maxStepGapUs: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    require(maxStepGapUs.forall(_ > 0),
      s"maxStepGapUs must be positive, got $maxStepGapUs")
    val w = Window.partitionBy("user_id").orderBy("tu", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events
      .where(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_id"),
        epochUs(col("ts")).as("tu"), col("event_type"))
    // running first-reach time of each step, folded left to right:
    // step k's candidate rows are those strictly after (and, with a
    // conversion window, within gap of) step k-1's running minimum as
    // of that row
    def inWindow(prev: Column): Column = maxStepGapUs match {
      case Some(g) => col("tu") > prev && col("tu") <= prev + g
      case None    => col("tu") > prev
    }
    val withRuns = steps.zipWithIndex.foldLeft(base) {
      case (df, (step, 0)) =>
        df.withColumn("_r0",
          min(when(col("event_type") === step, col("tu"))).over(w))
      case (df, (step, k)) =>
        df.withColumn(s"_r$k",
          min(when(col("event_type") === step &&
            col(s"_r${k - 1}").isNotNull && inWindow(col(s"_r${k - 1}")),
            col("tu"))).over(w))
    }
    val stepCols = steps.indices.map(k => min(col(s"_r$k")).as(s"s${k + 1}_us"))
    val agg = withRuns.groupBy("user_id").agg(stepCols.head, stepCols.tail: _*)
    val stage = steps.indices.map(k =>
      when(col(s"s${k + 1}_us").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    agg.filter(col("s1_us").isNotNull)
      .withColumn("funnel_stage", stage)
  }
}
