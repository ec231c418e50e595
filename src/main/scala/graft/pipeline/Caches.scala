package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Storage discipline for operators whose plans stage a corpus-scale
  * frame (signatures, postings) but whose RESULT is sublinear (verified
  * pair lists): materialize the small result into executor storage,
  * then release the big staging cache before returning — so a
  * long-lived pipeline session never accumulates corpus-sized blocks.
  *
  * [[materialize]] is `localCheckpoint(eager = true)`: the result's
  * partitions land in executor memory/disk and the lineage is
  * truncated, so the upstream caches can be dropped without making the
  * returned frame recompute (or fail). The only storage left behind is
  * the result itself — callers that are done with it hand it to
  * [[release]].
  *
  * localCheckpoint persists at the RDD layer, not the Dataset
  * CacheManager, so `Dataset.unpersist` is a no-op on it; [[release]]
  * walks to the plan's root RDD (lineage ends exactly at the
  * checkpoint) and unpersists that — the same walk
  * [[Dedup.dupClusters]] uses per round.
  */
object Caches {

  /** Eagerly compute `df` into executor storage, lineage truncated. */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Drop the blocks behind a [[materialize]]d frame. The frame must
    * not be used afterwards (its lineage was truncated — there is
    * nothing left to recompute from).
    */
  def release(df: DataFrame): Unit =
    persistedRdd(df).foreach(_.unpersist(blocking = false))

  /** [[release]] for blanket sweeps over frames that may or may not be
    * materialized (Verify/Bench run every queries() entry, only some of
    * which return checkpointed pair lists): quietly a no-op when the
    * frame is not a [[materialize]]d one. The check is on the ANALYZED
    * plan (localCheckpoint leaves a LogicalRDD root) — peeking at
    * `queryExecution.toRdd` instead would silently re-run the whole
    * optimizer/planner on every lazy frame, seconds of driver CPU per
    * complex plan (measured: ~+20 % on the full bench).
    */
  def releaseQuiet(df: DataFrame): Unit =
    if (df.queryExecution.analyzed.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD])
      persistedRdd(df, quiet = true).foreach(_.unpersist(blocking = false))

  /** The persisted RDD inside a materialized frame's physical plan:
    * the first storage-levelled RDD on a breadth-first dependency walk.
    * (After localCheckpoint the LINEAGE root is a storage-less
    * placeholder LocalCheckpointRDD — the persisted node sits one level
    * above it, so "walk to the root" would find the wrong RDD. BFS over
    * ALL dependencies, not just the first: a branchy physical plan —
    * union, zipped join — would otherwise silently hide the persisted
    * node and turn release() into a leak with no signal.)
    */
  private[pipeline] def persistedRdd(ds: DataFrame,
      quiet: Boolean = false): Option[org.apache.spark.rdd.RDD[_]] = {
    val seen = scala.collection.mutable.Set.empty[Int]
    val queue = scala.collection.mutable.Queue[org.apache.spark.rdd.RDD[_]](
      ds.queryExecution.toRdd)
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      if (seen.add(r.id)) {
        if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
          return Some(r)
        queue.enqueueAll(r.dependencies.map(_.rdd))
      }
    }
    // A release() on a frame with no persisted node is a likely caller
    // bug (the blocks it meant to drop live elsewhere) — say so.
    if (!quiet) System.err.println(
      "[graft.Caches] release: no storage-levelled RDD found in plan — " +
        "frame was not materialized (no-op)")
    None
  }
}
