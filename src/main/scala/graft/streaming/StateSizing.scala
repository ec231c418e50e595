package graft.streaming

import org.apache.spark.sql.DataFrame

/** State-store partition sizing rule (VERDICT r10 #3) — the number of
  * shuffle partitions a stateful stream starts with IS its state-store
  * layout for life, so it must be sized to the STATE, not to cores:
  *
  *   - too many partitions: every micro-batch commits every store
  *     instance (a stream-stream join commits FOUR per partition), a
  *     fixed per-store cost that dominated the r9 bench at 32
  *     partitions for KB-sized state (st7: 14–17 s of pure commit
  *     overhead, data-independent);
  *   - too few: per-store state outgrows executor memory as live keys
  *     grow — the exact failure the batch side measured at its 100×
  *     point (per-partition aggregation state into GC thrash).
  *
  * The rule derives the count from an ESTIMATE of live state bytes
  * (expected live keys × bytes per key — callers pass a cheap upper
  * bound, e.g. input rows or cells):
  *
  *   partitions = clamp(ceil(stateBytes / 32 MB), 8, 4096)
  *
  * 32 MB per store keeps snapshot/commit and per-task GC bounded; the
  * floor of 8 is where r10's measurements put the commit-overhead knee
  * at bench-scale state (halved st10's CPU vs 32); the ceiling guards
  * against degenerate estimates. The bench-scale 8 and a
  * production-scale 2048 fall out of the same computation.
  */
object StateSizing {
  val TargetStateBytesPerPartition: Long = 32L << 20
  val MinParts = 8
  val MaxParts = 4096

  def partitions(estStateBytes: Long): Int =
    math.max(MinParts, math.min(MaxParts,
      math.ceil(estStateBytes.toDouble / TargetStateBytesPerPartition).toInt))

  /** Estimate from an input frame: live keys are bounded by
    * `keysPerRow` state keys per input row at `bytesPerKey` bytes each
    * (key + aggregation buffer). Runs one cheap count job — the
    * streaming entries already stage this frame to disk, so the count
    * is marginal.
    */
  def forFrame(df: DataFrame, keysPerRow: Double, bytesPerKey: Long): Int =
    partitions((df.count() * keysPerRow * bytesPerKey).toLong)
}
