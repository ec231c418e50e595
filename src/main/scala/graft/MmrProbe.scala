package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for MMR retrieval (pl_a8, Ann.mmrTopK) at
  * realistic probe fan-out (VERDICT r12 #6): the entry's contract is
  * P=8 probes; this measures P in the thousands — where the
  * materialized candidate table is P×n rows, the pairwise sim table
  * P×n² rows, and each of the k−1 greedy steps is a sequential Spark
  * job (join + per-probe argmax window). What to read from the
  * output: whether cost is dominated by the P-proportional
  * materializations (healthy — they are bounded by construction) or
  * by the fixed per-step job latency × (k−1) (the small-P regime),
  * and where the P×n² table would stop fitting memory.
  *
  * Pass `hier` as the 5th arg to swap the candidate stage from the
  * brute P×corpus scan to the hier-IVF-SQ8 index (pl_a13,
  * Ann.mmrTopKHier, k ∝ corpus list rule) — the delta between the two
  * runs isolates the candidate-scoring term the sublinear index
  * removes; the MMR tail (P×n² sims + k−1 greedy steps) is identical.
  *
  * Usage: runMain graft.MmrProbe <sfDir> <P> [n] [k] [hier]
  * One probe per JVM (DESIGN.md probe discipline).
  */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val p = args.lift(1).map(_.toLong).getOrElse(8L)
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val k = args.lift(3).map(_.toInt).getOrElse(5)
    val hier = args.lift(4).contains("hier")
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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb.count()
    require(p <= nVec, s"P=$p exceeds corpus size $nVec")

    def once(tag: String): Unit = {
      System.gc()
      val c0 = cpuSec; val t0 = System.nanoTime()
      val r =
        if (hier) {
          // the AnnProbe ivfsq8h knobs: k ∝ corpus, b ≈ √k, 10 %
          // sampled train, trained coarse, 2 list-probes
          val kk = math.max(8, (nVec / 250).toInt)
          graft.pipeline.Ann.mmrTopKHier(emb, col("vec_id") < p, n, k,
            kk, math.max(2, math.sqrt(kk.toDouble).round.toInt), 2,
            100000L, 2, trainedCoarse = true, listProbes = 2)
        } else graft.pipeline.Ann.mmrTopK(emb, col("vec_id") < p, n, k)
      val rows = r.count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.pipeline.Caches.releaseQuiet(r)
      println(f"[mmrprobe] $tag hier=$hier n_vec=$nVec P=$p n=$n k=$k " +
        f"rows=$rows sims=${p * n * (n - 1)} wall=$wall%.2f " +
        f"cpu=${cpuSec - c0}%.2f")
    }
    once("cold")
    once("warm")
    spark.stop()
  }
}
