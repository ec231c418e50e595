package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style bucketed table layout: pay the shuffle ONCE at write
  * time, then every equi-join or aggregation on the bucket key reads
  * co-located data and plans shuffle-free — the standing answer to
  * "this fact table is joined on the same key by every downstream
  * query". At 100 TB the difference is one 100 TB exchange per run vs
  * zero: two tables bucketed the same way on the join key sort-merge
  * join with NO Exchange on either side (PlanShapeSpec asserts this
  * with broadcast disabled; at harness scale AQE may still elect a
  * broadcast join, which bucketing never makes worse).
  *
  * Bucket-pruning and one-file-per-bucket sorted scans also make
  * point lookups on the key touch 1/nBuckets of the data.
  *
  * The bucket metadata lives in the session catalog (`saveAsTable` —
  * plain parquet files at `path` plus bucket spec), which is how Spark
  * carries layout knowledge into planning; a bare `.parquet(path)`
  * write cannot record it.
  */
object BucketedLayout {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table.
    * Idempotent: drops and overwrites any prior table of this name.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: String): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(df.columns.contains(key), s"missing bucket key $key")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket keys. With equal
    * bucket counts the planner sees both sides already hash-distributed
    * on the join key and plans no exchange.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      col(leftKey) === col(rightKey))
}
