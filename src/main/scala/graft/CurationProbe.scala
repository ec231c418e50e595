package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for the FULL curation composition (pl_p3):
  * quality gate → exact-dup keeper → near-dup loser drop →
  * decontamination → token-budget mixture → split → chunking, the
  * production-shaped pipeline, run per-stage on an N× documents
  * fixture (ScaleFixtures `documents` mode — vocabulary-disjoint
  * copies, so the dedup substrate scales honestly: exact clusters and
  * LSH buckets never merge across copies).
  *
  * Reports, per the r14 verdict's ask:
  *   - wall for the signature checkpoint (keptPlan's eager job — the
  *     ONE corpus-scale intermediate),
  *   - wall for the production checkpoint (clean = kept ∖ contam),
  *   - wall for the post-checkpoint tail (mixture→split→chunk→join),
  *   - raw documents.parquet FileScan count in BOTH the static
  *     pre-checkpoint plan and the final AQE executed plan (the
  *     plan-shape claim PlanShapeSpec locks at test scale, re-checked
  *     at probe scale).
  *
  * Mixture budgets scale ×factor (sources repeat across copies; a
  * fixed budget would admit a vanishing fraction and the tail would
  * measure nothing).
  *
  * Usage: runMain graft.CurationProbe <docsDir> <factor>
  * One probe per JVM (DESIGN.md probe discipline).
  */
object CurationProbe {
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
    def timed[A](f: => A): (A, Double, Double) = {
      val c0 = cpuSec; val t0 = System.nanoTime()
      val a = f
      ((a, (System.nanoTime() - t0) / 1e9, cpuSec - c0))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val corpus = docs.filter(pmod(col("doc_id"), lit(37L)) =!= 0L)
    val bench = docs.filter(pmod(col("doc_id"), lit(37L)) === 0L)
    val budgets = Map("src1" -> 2000L * factor, "src3" -> 400L * factor)
    val defBudget = 1000L * factor

    // stage 1: keptPlan — the eager narrow-signature checkpoint job
    // (keeper semi-join + shingle/minhash over keepers) runs HERE
    val ((kept, sigs), wSig, cSig) =
      timed(graft.pipeline.CorpusFilter.keptPlan(corpus, 0.7))
    val contam = graft.pipeline.Dedup.contaminated(corpus, bench, 4)
      .select("doc_id")
    val lazyClean = kept.select("doc_id", "source", "n_tokens", "text")
      .join(contam, Seq("doc_id"), "left_anti")
    // an executed AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" sections — count only up to the initial-plan
    // marker or every scan is double-counted
    def countDocScans(p: String): Int = {
      val cut = p.indexOf("== Initial Plan ==")
      val s = if (cut >= 0) p.substring(0, cut) else p
      s.linesIterator.count(l =>
        l.contains("FileScan") && l.contains("documents.parquet"))
    }
    val staticScans = countDocScans(
      lazyClean.queryExecution.executedPlan.toString)

    // stage 2: the production checkpoint (quality + keeper semi +
    // loser anti + decontam anti, one pass over the corpus)
    val (clean, wClean, cClean) =
      timed(graft.pipeline.Caches.materialize(lazyClean))
    graft.pipeline.Caches.release(sigs)
    val nClean = clean.count()
    // AQE final plan of the pre-checkpoint composition, post-execution
    val aqeScans = countDocScans(
      lazyClean.queryExecution.executedPlan.toString)

    // stage 3: post-checkpoint tail — mixture → split → chunk → join
    val (nChunks, wTail, cTail) = try {
      timed {
        val mixed = graft.pipeline.Sampling.tokenBudgetMix(clean,
          col("doc_id"), col("source"), col("n_tokens"), budgets, defBudget)
        val labeled = graft.pipeline.Sampling.splitLabels(mixed,
          col("doc_id"),
          Seq("train" -> 900000L, "val" -> 50000L, "test" -> 50000L))
        val chunks = graft.pipeline.TextOps.chunkTokens(
          labeled.select("doc_id", "text"), 32, 24)
        val out = graft.pipeline.Caches.materialize(
          chunks.join(
            labeled.select("doc_id", "source", "split", "cum_before"),
            Seq("doc_id")))
        val n = out.count()
        graft.pipeline.Caches.release(out)
        n
      }
    } finally graft.pipeline.Caches.release(clean)

    println(f"[curprobe] factor=$factor n_docs=$nDocs n_clean=$nClean " +
      f"n_chunks=$nChunks static_scans=$staticScans aqe_scans=$aqeScans")
    println(f"[curprobe] walls sig=$wSig%.2f clean=$wClean%.2f " +
      f"tail=$wTail%.2f total=${wSig + wClean + wTail}%.2f " +
      f"cpu=${cSig + cClean + cTail}%.2f")
    spark.stop()
  }
}
