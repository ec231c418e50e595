package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-bin assignment (SURVEY §2.5 W2) for the averaging kernel.
  *
  * The reference's africanus kernel walks rows per baseline in TIME
  * order, accumulating INTERVAL until `time_bin_secs` is reached
  * (xova/apps/xova/chunking.py:107-166 mirrors it driver-side). Two
  * Spark formulations, both shuffle-once:
  *
  *  - [[assignGrid]]: bin = floor((TIME - t0) / binSecs) where t0 is the
  *    group's first time. t0 is a tiny per-group aggregate broadcast back
  *    — no window over the fact table, so at 100 TB the only full shuffle
  *    is the groupBy of the averaging itself. This matches the kernel
  *    whenever sampling is regular (the common case).
  *
  *  - [[assignRunning]]: bin = (cumsum(INTERVAL) - INTERVAL) div binSecs
  *    per (group, baseline) in TIME order — the accumulate-until-full
  *    semantics for irregular sampling. Costs one window shuffle keyed by
  *    baseline; baseline cardinality is high (2016+ for 64 antennas), so
  *    partitions stay balanced at scale.
  *
  * Bin-closure boundary choice (explicit, per SURVEY §7.3 risk 2): a row
  * starts a new bin iff the interval accumulated BEFORE it has reached
  * binSecs.
  */
object TimeAvg {
  val GroupCols = Seq("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER")

  /** Grid binning: broadcast-join the per-group min(TIME) back, then a
    * pure projection. Adds column BIN (int).
    */
  def assignGrid(df: DataFrame, binSecs: Double): DataFrame = {
    val t0 = df.groupBy(GroupCols.map(col): _*).agg(min("TIME").as("_T0"))
    df.join(broadcast(t0), GroupCols)
      .withColumn("BIN", floor((col("TIME") - col("_T0")) / lit(binSecs)).cast("int"))
      .drop("_T0")
  }

  /** Accumulate-until-full binning per (group, baseline). */
  def assignRunning(df: DataFrame, binSecs: Double): DataFrame =
    assignRunning(df, lit(binSecs))

  /** Column form: per-row (in practice per-baseline — BDA's
    * decorrelation-derived widths) bin size.
    */
  def assignRunning(df: DataFrame, binSecs: Column): DataFrame = {
    val w = Window
      .partitionBy((GroupCols ++ Seq("ANTENNA1", "ANTENNA2")).map(col): _*)
      .orderBy("TIME")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_CUM", sum(col("INTERVAL")).over(w))
      .withColumn("BIN", floor((col("_CUM") - col("INTERVAL")) / binSecs).cast("int"))
      .drop("_CUM")
  }

  /** Full group key of one output row (A1 contract: bins never span
    * partition or baseline boundaries, xova/apps/xova/averaging.py:217).
    */
  val BinKey: Seq[String] =
    GroupCols ++ Seq("ANTENNA1", "ANTENNA2", "BIN")
}
