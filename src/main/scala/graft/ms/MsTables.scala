package graft.ms

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the parquet Measurement Set layout (main + subtables),
  * the Spark-side analog of the reference's dask-ms table access
  * (/root/reference/xova/apps/xova/app.py:162-195). `ensure` lazily
  * materializes the deterministic fixture on first use.
  */
object MsTables {
  def apply(spark: SparkSession, root: String, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")

  /** Fixture accessors (S1/S3/S4-style scans). */
  def main(s: SparkSession): DataFrame = fx(s, "main")
  def spw(s: SparkSession): DataFrame = fx(s, "SPECTRAL_WINDOW")
  def pol(s: SparkSession): DataFrame = fx(s, "POLARIZATION")
  def ddid(s: SparkSession): DataFrame = fx(s, "DATA_DESCRIPTION")
  def field(s: SparkSession): DataFrame = fx(s, "FIELD")
  def antenna(s: SparkSession): DataFrame = fx(s, "ANTENNA")

  private def fx(s: SparkSession, t: String): DataFrame = {
    SyntheticMs.ensure(s)
    apply(s, SyntheticMs.root, t)
  }
}
