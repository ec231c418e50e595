package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for BM25 retrieval (pl_r1,
  * Retrieval.bm25TopK) with a MATCHED-VOCABULARY query load (VERDICT
  * r12 #3): the vocabulary-disjoint N× document fixture prefixes
  * every token of copy i with `c<i>`, so the probe issues the pl_r1
  * query set PER COPY with the same prefix — query terms hit exactly
  * copy i's postings. Both the data AND the query load scale by N
  * (the decontamination deployment shape: more corpus, more benchmark
  * prompts), and the postings explode, the df/contribution shuffles,
  * and the per-query WindowGroupLimit top-k all do real work at
  * scale — the previous 100× reading pruned every posting before the
  * first shuffle and measured only the scan.
  *
  * Usage: runMain graft.Bm25Probe <sfDir> <factor> — factor 1 probes
  * the raw corpus with the unprefixed queries; factor N expects the
  * `ScaleFixtures ... N documents` fixture in sfDir. One probe per
  * JVM (DESIGN.md probe discipline).
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuSec: Double = osBean.getProcessCpuTime / 1e9

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = graft.queries.PipelineQueries.Bm25Queries
    // per-copy query ids stay disjoint (base ids are 1..4)
    val queries =
      if (factor == 1) base
      else (0 until factor).flatMap { i =>
        base.map { case (qid, ts) =>
          (i * 100L + qid, ts.map(t => s"c$i$t"))
        }
      }
    val termSet = queries.flatMap(_._2).distinct

    def once(tag: String): Unit = {
      System.gc()
      val c0 = cpuSec; val t0 = System.nanoTime()
      val r = graft.pipeline.Retrieval.bm25TopK(docs, queries, 10)
      val rows = r.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[bm25probe] $tag factor=$factor queries=${queries.size} " +
        f"rows=$rows wall=$wall%.2f cpu=${cpuSec - c0}%.2f")
    }
    once("cold")
    once("warm")

    // postings survival — the count that was ZERO in the r12 probe.
    // Counted AFTER the timed runs (r14 ADVICE: running this scan
    // first warmed the page cache and quietly un-colded "cold").
    val nPostings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(col("term").isin(termSet: _*))
      .count()
    println(s"[bm25probe] postings factor=$factor n=$nPostings")
    spark.stop()
  }
}
