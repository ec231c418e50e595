package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for semantic dedup (pl_d14,
  * Dedup.semanticDedupPairs): runs the clustering + same-cluster pair
  * scan on a given embeddings fixture and reports wall/cpu, pair
  * count, and the cluster-size profile (Σn_c², max n_c) that IS the
  * pair-join cost model. Pair with the `embeddings_reflect`
  * ScaleFixtures mode: within-copy pair structure preserved exactly
  * (reflection is an isometry), cross-copy duplication broken, so
  * pair output scales ~N and the Σn_c² claim is measurable — the
  * exact-copy fixture grows pairs ~N² by construction (VERDICT r12
  * missing #2). Cluster count k must scale with the copy factor
  * (fixed k at growing N makes n_c ∝ N and Σn_c² ∝ N² for ANY
  * clustering method — the SemDeDup deployment rule is k ∝ corpus).
  *
  * Usage: runMain graft.SemanticProbe <sfDir> [k] [rounds] [minCos]
  *   [b] [trainPpm] [agree] [probes] [tc] — pass b > 0 to route through
  * [[graft.pipeline.Dedup.semanticDedupPairsHier]] (coarse→fine
  * hierarchical assignment + sampled training) instead of the exact
  * N·k path. One probe per JVM (DESIGN.md probe discipline).
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val rounds = args.lift(2).map(_.toInt).getOrElse(2)
    val minCos = args.lift(3).map(_.toDouble).getOrElse(0.45)
    val b = args.lift(4).map(_.toInt).getOrElse(0)
    val trainPpm = args.lift(5).map(_.toLong).getOrElse(1000000L)
    val probes = args.lift(7).map(_.toInt).getOrElse(1)
    val tc = args.lift(8).exists(_ == "1")
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

    def once(tag: String): Unit = {
      System.gc()
      val c0 = cpuSec; val t0 = System.nanoTime()
      val pairs =
        if (b > 0) graft.pipeline.Dedup.semanticDedupPairsHier(
          emb, k, b, rounds, minCos, trainPpm, probes, tc)
        else graft.pipeline.Dedup.semanticDedupPairs(emb, k, rounds, minCos)
      if (tag == "cold" && sys.env.contains("GRAFT_PRINT_PLAN"))
        println(pairs.queryExecution.executedPlan.toString.take(6000))
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.pipeline.Caches.releaseQuiet(pairs)
      println(f"[semprobe] $tag n_vec=$nVec k=$k b=$b p=$probes tc=$tc " +
        f"ppm=$trainPpm " +
        f"pairs=$nPairs wall=$wall%.2f cpu=${cpuSec - c0}%.2f")
    }
    once("cold")
    once("warm")

    // cluster-size profile — the pair join touches exactly Σ n_c²
    // candidate pairs; max n_c is the skew bound of the cluster-keyed
    // shuffle. The exact path's model checkpoint (lastCent) is released
    // after the profile aggregate lands (r14 ADVICE: `_1` discarded it
    // and leaked the k-row blocks for the probe's lifetime).
    val (assigned, centOpt) =
      if (b > 0)
        (graft.pipeline.Ann.hierAssign(emb, k, b, rounds, trainPpm, probes,
          tc), None)
      else {
        val (a, c) = graft.pipeline.Ann.kmeansModel(emb, k, rounds)
        (a, Some(c))
      }
    // routing-only wall: one pass over the corpus through the
    // assignment projection, no pair join
    locally {
      val c0 = cpuSec; val t0 = System.nanoTime()
      val n = assigned.count()
      println(f"[semprobe] routing n=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f cpu=${cpuSec - c0}%.2f")
    }
    val sizes = assigned.groupBy("cluster").count()
      .agg(sum(col("count") * col("count")).as("sum_sq"),
        max(col("count")).as("max_c"),
        count(lit(1)).as("n_clusters")).head()
    centOpt.foreach(graft.pipeline.Caches.releaseQuiet)
    println(s"[semprobe] profile sum_nc2=${sizes.getLong(0)} " +
      s"max_nc=${sizes.getLong(1)} live_clusters=${sizes.getLong(2)} " +
      s"nc2_over_n2=${sizes.getLong(0).toDouble / (nVec.toDouble * nVec)}")

    // assignment agreement vs exact full-corpus Lloyd (opt-in, arg 7:
    // agree=1; only meaningful on the hier path) — the quality side of
    // the N·(b+k/b) vs N·k trade: % of vectors the sampled-train +
    // coarse→fine routing puts in the SAME cluster as the exact model.
    if (b > 0 && args.lift(6).exists(_ == "1")) {
      val (exact, cent) = graft.pipeline.Ann.kmeansModel(emb, k, rounds)
      val hier = assigned.select(col("vec_id"), col("cluster").as("hc"))
      val both = exact.select(col("vec_id"), col("cluster").as("ec"))
        .join(hier, "vec_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("ec") === col("hc"), 1L).otherwise(0L)).as("same"))
        .head()
      graft.pipeline.Caches.releaseQuiet(cent)
      val agree = both.getLong(1).toDouble / both.getLong(0)
      println(f"[semprobe] agreement n=${both.getLong(0)} " +
        f"same=${both.getLong(1)} pct=${agree * 100}%.2f")
    }
    spark.stop()
  }
}
