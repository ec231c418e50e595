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

  /** N× documents corpus as N VOCABULARY-DISJOINT copies (the sf1
    * construction, now reproducible at any factor): every token of
    * copy i is prefixed `c<i>` — a per-copy bijective token mapping,
    * so within-copy shingle/n-gram similarity structure (hence the
    * dup-pair and cluster profile) is preserved EXACTLY while
    * cross-copy similarity is zero; pair/cluster counts scale ~N.
    * doc_id offsets by i·(max_doc_id+1).
    */
  def scaledDocs(s: SparkSession, srcDir: String, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val docs = s.read.parquet(s"$srcDir/documents.parquet")
    val dStride = docs.agg(max("doc_id")).head().getLong(0) + 1L
    (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i * dStride)).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "),
            t => concat(lit(s"c$i"), t))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleFixtures <srcSfDir> <outDir> <factor> [events|documents]")
    val Array(src, out, f) = args.take(3)
    val table = if (args.length == 4) args(3) else "events"
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
    val scaled =
      if (table == "documents") scaledDocs(spark, src, f.toInt)
      else scaledEvents(spark, src, f.toInt)
    scaled
      .coalesce(1).write.mode("overwrite").parquet(staging.getAbsolutePath)
    val part = staging.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dst = new File(outDir, s"$table.parquet")
    if (dst.exists()) dst.delete()
    Files.move(part.toPath, dst.toPath)
    Option(staging.listFiles()).foreach(_.foreach(_.delete()))
    staging.delete()
    println(s"[scale] wrote ${dst.getAbsolutePath} (${f}x $src)")
    spark.stop()
  }
}
