package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe fixture builder (DESIGN.md "10× scale probes"): writes an
  * N× `events.parquet` built as N user-disjoint copies of a source table
  * — copy i offsets `user_id` by i·(max_user+1) and `event_id` by
  * i·(max_id+1), leaving `ts`/`event_type`/`value` untouched — so every
  * per-user event sequence (sessions, funnels, cohorts) is preserved
  * EXACTLY while distinct-user count, per-window row count, and live
  * state-store keys all scale by N. The same construction discipline as
  * the vocabulary-disjoint sf1 document corpus: structure preserved
  * within a copy, zero interaction across copies.
  *
  * Usage: runMain graft.ScaleFixtures <srcSfDir> <outDir> <factor>
  * Emits `<outDir>/events.parquet` as ONE file (the streaming entries
  * stage/copy it as a single file, matching the driver's testdata
  * layout).
  */
object ScaleFixtures {
  def scaledEvents(s: SparkSession, srcDir: String, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val ev = s.read.parquet(s"$srcDir/events.parquet")
    val (uStride, eStride) = {
      val r = ev.agg(max("user_id"), max("event_id")).head()
      (r.getLong(0) + 1L, r.getLong(1) + 1L)
    }
    (0 until factor).map { i =>
      ev.select(
        (col("event_id") + lit(i * eStride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * uStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleFixtures <srcSfDir> <outDir> <factor>")
    val Array(src, out, f) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.io.File
    import java.nio.file.Files
    val outDir = new File(out); outDir.mkdirs()
    val staging = new File(outDir, "_staging")
    scaledEvents(spark, src, f.toInt)
      .coalesce(1).write.mode("overwrite").parquet(staging.getAbsolutePath)
    val part = staging.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dst = new File(outDir, "events.parquet")
    if (dst.exists()) dst.delete()
    Files.move(part.toPath, dst.toPath)
    Option(staging.listFiles()).foreach(_.foreach(_.delete()))
    staging.delete()
    println(s"[scale] wrote ${dst.getAbsolutePath} (${f}x $src)")
    spark.stop()
  }
}
