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

  /** The persisted RDD inside a materialized frame's physical plan:
    * the first storage-levelled RDD on the dependency walk. (After
    * localCheckpoint the LINEAGE root is a storage-less placeholder
    * LocalCheckpointRDD — the persisted node sits one level above it,
    * so "walk to the root" would find the wrong RDD.)
    */
  private[pipeline] def persistedRdd(
      ds: DataFrame): Option[org.apache.spark.rdd.RDD[_]] = {
    @annotation.tailrec
    def walk(r: org.apache.spark.rdd.RDD[_]): Option[org.apache.spark.rdd.RDD[_]] =
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        Some(r)
      else r.dependencies.headOption match {
        case Some(d) => walk(d.rdd)
        case None    => None
      }
    walk(ds.queryExecution.toRdd)
  }
}
