package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
