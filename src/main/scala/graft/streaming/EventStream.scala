package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (extension beyond reference parity —
  * the reference is strictly batch, SURVEY §2.9; these cover the
  * streaming side of the same aggregation shapes so the engine can run
  * the A1-style binning continuously over an event stream).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond it is dropped and state evicted); the stateful
  * per-key pass uses `mapGroupsWithState`, whose state store shards by
  * the grouping key across executors — the streaming analog of the
  * baseline-keyed shuffle in the batch kernel.
  */
object EventStream {

  case class Event(ts: java.sql.Timestamp, user_id: Long, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Event-time tumbling-window aggregation with a watermark — the
    * streaming form of the W2+A1 bin-and-aggregate shape.
    */
  def windowedStats(events: DataFrame, windowDur: String,
                    watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  case class SessEvent(user_id: Long, tu: Long, cents: Long, flush: Boolean)
  case class SessState(start: Long, last: Long, n: Long, cents: Long,
                       nextId: Long)
  case class Session(user_id: Long, session_id: Long, s_start_us: Long,
                     s_end_us: Long, n_events: Long, value_cents: Long)

  /** Incremental gap-based sessionization via flatMapGroupsWithState —
    * the streaming form of [[graft.ops.EventOps.sessionize]] (same
    * strictly-greater-than-gap break rule, so the two are
    * bit-identical). State per user is ONE open session (start, last,
    * n, cents) plus the next session ordinal; a closed session is
    * emitted the moment an event lands beyond the gap (Append mode),
    * so state never grows with history. Events whose `flush` flag is
    * set (sentinel rows the caller appends after the real stream) close
    * and emit the open session without opening another — the
    * end-of-stream flush a pure watermark timeout can't express with a
    * finite file stream.
    *
    * Within a micro-batch the group's rows are buffered and sorted by
    * event time (bounded by batch size, not history); across batches
    * the caller must deliver files in event-time order, which the
    * entry's two-phase (data, then flush) layout guarantees.
    */
  def sessionize(events: Dataset[SessEvent], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          val sorted = rows.toArray.sortBy(_.tu)
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.orNull
          var flushed = false
          sorted.foreach { e =>
            if (e.flush) {
              if (st != null) {
                out += Session(user, st.nextId, st.start, st.last, st.n, st.cents)
                st = null
              }
              flushed = true
            } else if (st == null) {
              st = SessState(e.tu, e.tu, 1L, e.cents, 0L)
            } else if (e.tu - st.last > gapUs) {
              out += Session(user, st.nextId, st.start, st.last, st.n, st.cents)
              st = SessState(e.tu, e.tu, 1L, e.cents, st.nextId + 1)
            } else {
              st = st.copy(last = e.tu, n = st.n + 1, cents = st.cents + e.cents)
            }
          }
          if (st != null) state.update(st)
          else if (flushed && state.exists) state.remove()
          out.iterator
      }
  }

  /** Streaming exact-dedup — [[graft.pipeline.Dedup.exactClusters]]'s
    * keeper rule (md5 groupBy, keeper = min doc_id) executed by the
    * streaming engine: the state store carries one (count, min) partial
    * per content hash, merged across micro-batches, so copies of the
    * same document arriving in DIFFERENT batches still collapse to one
    * keeper — the continuous-ingest form of corpus dedup. Complete
    * mode; state is bounded by the distinct-content count, the same
    * md5-keyed cardinality the batch shuffle carries.
    */
  def exactClusters(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("md5_fp"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper"))

  case class FunnelEvent(user_id: Long, event_id: Long, tu: Long,
                         step: Int, flush: Boolean)
  case class FunnelReach(reach: Seq[Long])
  case class FunnelOut(user_id: Long, reach: Seq[Long])

  /** Incremental ordered-step funnel via flatMapGroupsWithState — the
    * streaming form of [[graft.ops.EventOps.funnel]] (same
    * first-completion chain: step k's reach is the first step-k event
    * strictly after — and, with `maxStepGapUs`, within the window of —
    * step k-1's reach). State per user is ONE fixed-width vector of
    * first-reach micros (-1 = unreached), so state never grows with
    * history — the whole point vs buffering the event log.
    *
    * Exactness contract: reach times only ever get SET, at the current
    * event's time, and events arrive in event-time order (within a
    * micro-batch the group's rows are sorted by (tu, event_id) — the
    * batch window's ORDER BY; across batches the caller stages files
    * in time order, st7-style), so the first qualifying event in
    * arrival order IS the batch plan's running minimum and the two
    * implementations are bit-identical. Rows with `flush` set (caller-
    * appended sentinels, far-future tu so they sort last) emit the
    * user's final vector and clear state — users who never reach step
    * 1 emit nothing, mirroring the batch filter.
    */
  def funnel(events: Dataset[FunnelEvent], nSteps: Int,
             maxStepGapUs: Option[Long] = None): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(nSteps >= 2, s"a funnel needs >= 2 steps, got $nSteps")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelReach, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelReach]) =>
          val reach = state.getOption.map(_.reach.toArray)
            .getOrElse(Array.fill(nSteps)(-1L))
          val doFlush = advanceReach(reach, rows.toArray, maxStepGapUs)
          if (doFlush) {
            if (state.exists) state.remove()
            if (reach(0) >= 0) Iterator.single(FunnelOut(user, reach.toSeq))
            else Iterator.empty
          } else {
            state.update(FunnelReach(reach.toSeq))
            Iterator.empty
          }
      }
  }

  /** One micro-batch of the funnel chain: fold a group's events (any
    * order — sorted here by the batch window's (tu, event_id) ORDER BY)
    * into the reach vector in place; returns whether a flush sentinel
    * was seen. Package-private so the batch-equivalence property test
    * can drive the exact state transition the stream executes.
    */
  private[graft] def advanceReach(reach: Array[Long],
      events: Array[FunnelEvent], maxStepGapUs: Option[Long]): Boolean = {
    var doFlush = false
    events.sortBy(e => (e.tu, e.event_id)).foreach { e =>
      if (e.flush) doFlush = true
      else if (e.step == 0) {
        if (reach(0) < 0) reach(0) = e.tu
      } else if (reach(e.step) < 0 && reach(e.step - 1) >= 0 &&
        e.tu > reach(e.step - 1) &&
        maxStepGapUs.forall(g => e.tu <= reach(e.step - 1) + g)) {
        reach(e.step) = e.tu
      }
    }
    doFlush
  }

  case class RetEvent(user_id: Long, tu: Long, flush: Boolean)
  case class RetState(cohortDay: Long, buckets: Seq[Long])
  case class RetOut(user_id: Long, cohort_day: Long, buckets: Seq[Long])

  /** Incremental cohort retention via flatMapGroupsWithState — the
    * streaming form of [[graft.ops.EventOps.retention]]'s per-user
    * half: state per user is (cohort day, set of active bucket
    * offsets). The cohort day is fixed by the FIRST event (events
    * arrive in time order — the st8 staging contract — so the first
    * arrival IS the batch running-min); each later event only adds
    * `(day - cohort) / bucketDays` to the bucket set, so state is
    * bounded by the observation span over `bucketDays`, never by event
    * count. Flush sentinels emit the user's final (cohort, buckets)
    * and clear state; the caller's batch tail — explode + cell-keyed
    * count — turns the per-user rows into the retention matrix, which
    * is exact because each user emits each bucket exactly once.
    */
  def retention(events: Dataset[RetEvent], bucketDays: Int): Dataset[RetOut] = {
    import events.sparkSession.implicits._
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    val dayUs = 86400000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[RetEvent], state: GroupState[RetState]) =>
          var cohort = state.getOption.map(_.cohortDay).getOrElse(Long.MinValue)
          val buckets = scala.collection.mutable.SortedSet.empty[Long] ++
            state.getOption.map(_.buckets).getOrElse(Seq.empty)
          var doFlush = false
          rows.toArray.sortBy(_.tu).foreach { e =>
            if (e.flush) doFlush = true
            else {
              val d = e.tu / dayUs // tu >= 0 by the event-time contract
              if (cohort == Long.MinValue) cohort = d
              buckets += (d - cohort) / bucketDays
            }
          }
          if (doFlush) {
            if (state.exists) state.remove()
            if (cohort != Long.MinValue)
              Iterator.single(RetOut(user, cohort, buckets.toSeq))
            else Iterator.empty
          } else {
            if (cohort != Long.MinValue)
              state.update(RetState(cohort, buckets.toSeq))
            Iterator.empty
          }
      }
  }

  case class QuotaDoc(source: String, doc_id: Long, drw: Long,
                      n_tokens: Long)
  case class QuotaOut(doc_id: Long, source: String, n_tokens: Long,
                      cum_before: Long)

  /** Streaming per-group token-budget fill — the continuous-ingest
    * form of [[graft.pipeline.Sampling.tokenBudgetMix]]: each group
    * (source/domain) admits arriving documents until its token budget
    * is spent. Because the batch operator's admission rule
    * (`cum_before < budget` over a monotone running sum) never looks
    * at later rows, the streaming twin needs exactly ONE counter per
    * group as state — tokens seen so far — so state is bounded by the
    * number of groups, not stream length or corpus size: the
    * constant-state point of the streaming design space (st11/st13's
    * sketch-bound, here bound by a declared enum).
    *
    * Within a micro-batch the group's rows are sorted by (draw,
    * doc_id) — the batch operator's order — before folding; across
    * batches the caller must deliver files in global draw order (the
    * staged-slice contract), which makes the admitted set and every
    * `cum_before` bit-identical to the batch window. Rejected rows
    * still advance the counter (their tokens precede later arrivals
    * in the batch order), which is what keeps the two forms equal.
    */
  def tokenQuota(docs: Dataset[QuotaDoc], budgetByGroup: Map[String, Long],
                 defaultBudget: Long): Dataset[QuotaOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, QuotaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[QuotaDoc], state: GroupState[Long]) =>
          val budget = budgetByGroup.getOrElse(src, defaultBudget)
          val sorted = rows.toArray.sortBy(r => (r.drw, r.doc_id))
          var cum = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[QuotaOut]
          sorted.foreach { r =>
            if (cum < budget) out += QuotaOut(r.doc_id, src, r.n_tokens, cum)
            cum += r.n_tokens
          }
          state.update(cum)
          out.iterator
      }
  }

  /** Arbitrary stateful processing: running per-user totals via
    * mapGroupsWithState (the custom-state escape hatch for semantics
    * windowed aggregation can't express).
    */
  def runningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val next = rows.foldLeft(prev)((acc, e) =>
            UserTotal(user, acc.n + 1, acc.total + e.value))
          state.update(next)
          next
      }
  }
}
