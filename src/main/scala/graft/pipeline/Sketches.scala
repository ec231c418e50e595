package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching (KMV / k-minimum-values,
  * Bar-Yossef et al. 2002): keep the k smallest values of a uniform
  * hash over the domain; with R = kth-min / hash-range the estimator
  * (k-1)/R is unbiased. Unlike HLL, KMV over a FIXED hash (md5-derived
  * 60-bit, [[TextOps.hash60]]) is bit-deterministic on any engine, so
  * the estimate itself is oracle-checkable — the sketch the engine
  * would run at 100 TB where exact `count(distinct)` is a full-corpus
  * shuffle it can't afford.
  *
  * Scale: dedup of hashes is a map-side-combined aggregation; the
  * k-minimum pass is `orderBy(h).limit(k)` — TakeOrderedAndProject,
  * a per-partition top-k tree-reduced on the driver, never a global
  * sort. At production scale the exact count is simply dropped
  * (`withExact = false`); it is computed here so the entry can show
  * estimate-vs-truth in one row.
  */
object Sketches {

  /** One-row frame: `n_exact` (exact distinct hashes), `kth_hash`,
    * `k_eff` (= min(k, n_exact)), and `kmv_est` — the KMV estimate
    * floor((k_eff-1) * 2^60 / kth_hash + 0.5), computed in identical
    * IEEE double steps on any engine ((k-1)*2^60 is exact in double
    * for k ≤ 2^53 / 2^60-scale; one division; one round).
    */
  def kmvDistinct(df: DataFrame, hash: Column, k: Int,
                  withExact: Boolean = true): DataFrame = {
    val h = df.select(hash.as("h")).distinct().persist()
    try {
      val kmin = h.orderBy("h").limit(k)
        .agg(max(col("h")).as("kth_hash"),
          count(lit(1)).cast("long").as("k_eff"))
      val est = kmin.withColumn("kmv_est",
        round((col("k_eff") - 1).cast("double") * lit(math.pow(2, 60)) /
          col("kth_hash").cast("double")).cast("long"))
      val out =
        if (withExact)
          h.agg(count(lit(1)).cast("long").as("n_exact")).crossJoin(est)
        else est
      // the sketch is one row — materialize so unpersist is safe
      val rows = out.collect()
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally h.unpersist()
  }
}
