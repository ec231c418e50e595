package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ms.{MsTables, SyntheticMs}
import graft.ops.{Flags, TimeAvg, VisAggregator}

/** Microbenchmark: the averaging kernel as typed Aggregator (udaf /
  * encoder path) vs native TypedImperativeAggregate, on the fixture MS
  * replicated N× (baseline-shifted so group count scales too). Usage:
  *   sbt "runMain graft.KernelBench [replicas]"
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SyntheticMs.ensure(spark)

    // replicate by shifting SCAN_NUMBER: multiplies rows AND groups
    val rep = (0 until replicas)
      .map(i => MsTables.main(spark).withColumn("SCAN_NUMBER",
        col("SCAN_NUMBER") + lit(i * 2)))
      .reduce(_ unionAll _)
    val df = TimeAvg.assignGrid(
      Flags.filterAutocorr(rep).withColumn("FROW", Flags.derivedFlagRow),
      60000.0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[kbench] rows = ${df.count()}")

    val keys = TimeAvg.BinKey.map(col)
    def timeAgg(tag: String, rowC: org.apache.spark.sql.Column,
                visC: org.apache.spark.sql.Column): Unit = {
      (0 until 3).foreach { pass =>
        val t0 = System.nanoTime()
        df.groupBy(keys: _*).agg(rowC.as("R"), visC.as("V"))
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[kbench] $tag pass=$pass time=$dt%.2f s")
      }
    }

    timeAgg("udaf   ",
      VisAggregator.rowAvg(
        col("TIME"), col("INTERVAL"), col("TIME_CENTROID"), col("EXPOSURE"),
        col("FROW"), col("UVW"), col("WEIGHT"), col("SIGMA")),
      VisAggregator.visAvg(true, true)(
        col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
        col("SIGMA_SPECTRUM"), col("WEIGHT"), lit(4)))
    timeAgg("native ",
      graft.expressions.RowAvgAgg(
        col("TIME"), col("INTERVAL"), col("TIME_CENTROID"), col("EXPOSURE"),
        col("FROW"), col("UVW"), col("WEIGHT"), col("SIGMA")),
      graft.expressions.VisAvgAgg(true, true)(
        col("FROW"), col("DATA"), col("FLAG"), col("WEIGHT_SPECTRUM"),
        col("SIGMA_SPECTRUM"), col("WEIGHT"), lit(4)))

    spark.stop()
  }
}
