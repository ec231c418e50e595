package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for the ANN compression paths: runs ONE of
  * brute / PQ / SQ8 end-to-end (training + encode + probe + rerank,
  * exactly the pl_a1/pl_a6/pl_a9 shapes) on a given embeddings
  * fixture and reports cold/warm wall, process CPU, and — after the
  * timed passes — recall@k against the exact brute-force top-k
  * (SemanticProbe's agreement discipline: quality is measured in the
  * same JVM but outside the timing window).
  *
  * The comparison this exists to make: PQ and SQ8 answer probes over
  * the same compressed-scan shape (codes × broadcast probes), but PQ
  * pays 2 Lloyd rounds of codebook training per build while SQ8
  * "training" is one partial-aggregated min/max pass — at k ∝ nothing
  * (both are corpus-independent model sizes) the build cost difference
  * is the whole story, and recall@k quantifies what the cheaper grid
  * gives up. Pair with `embeddings_reflect` fixtures (within-copy
  * geometry preserved, cross-copy duplication broken) so neighbor
  * structure is realistic at every factor.
  *
  * Usage: runMain graft.AnnProbe <embDir>
  *   <brute|pq|sq8|ivfsq8|ivfsq8p|ivfsq8h> [k] [nProbes] [listProbes]
  * — ivfsq8 = full-train flat lists, ivfsq8p = 10 % sampled train +
  * 2-probe lists, ivfsq8h = hier-routed lists ([listProbes] = list
  * fan-out, the recall knob). One probe per JVM (DESIGN.md probe
  * discipline).
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AnnProbe <embDir> " +
      "<brute|pq|sq8|ivfsq8|ivfsq8p|ivfsq8h> [k] [nProbes] [listProbes]")
    val dir = args(0)
    val path = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(5)
    val nProbes = args.lift(3).map(_.toLong).getOrElse(8L)
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

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVec = emb.count()
    val probeF = col("vec_id") < nProbes

    def run() = path match {
      case "brute"   => pipeline.Ann.knnBrute(emb, probeF, k)
      case "pq"      => pipeline.Ann.annPq(emb, probeF, k, 2)
      case "sq8"     => pipeline.Ann.annSq8(emb, probeF, k)
      // IVF list count follows the SemDeDup k ∝ corpus rule so the
      // per-list candidate set stays bounded across factors
      case "ivfsq8"  => pipeline.Ann.annIvfSq8(emb, probeF, k,
        math.max(8, (nVec / 250).toInt), 2)
      // the production config: 10 % sampled training + 2-probe lists
      case "ivfsq8p" => pipeline.Ann.annIvfSq8(emb, probeF, k,
        math.max(8, (nVec / 250).toInt), 2, 100000L, 2)
      // the 10⁹-vector shape: hier-routed lists (trained coarse,
      // b ≈ √k, 10 % sampled train) — same knobs as ivfsq8p so the
      // delta isolates the router; arg 5 = listProbes (recall knob)
      case "ivfsq8h" =>
        val kk = math.max(8, (nVec / 250).toInt)
        pipeline.Ann.annIvfSq8Hier(emb, probeF, k, kk,
          math.max(2, math.sqrt(kk.toDouble).round.toInt), 2,
          100000L, 2, trainedCoarse = true,
          listProbes = args.lift(4).map(_.toInt).getOrElse(2))
      case other     => sys.error(s"unknown path $other")
    }

    def once(tag: String): Unit = {
      System.gc()
      val c0 = cpuSec; val t0 = System.nanoTime()
      val n = run().count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[annprobe] $tag path=$path n_vec=$nVec k=$k p=$nProbes " +
        f"rows=$n wall=$wall%.2f cpu=${cpuSec - c0}%.2f")
    }
    once("cold")
    once("warm")

    // quality, outside the timing window: recall@k = mean over probes
    // of |method top-k ∩ brute top-k| / k. Brute is its own baseline
    // (recall 1.0 by construction — a probe-harness sanity check).
    val got = run().select(col("probe_id"), col("neighbor_id"))
    val truth = pipeline.Ann.knnBrute(emb, probeF, k)
      .select(col("probe_id"), col("neighbor_id"))
    // denominator = the brute top-k's ACTUAL row count, not nProbes·k:
    // an IVF list shorter than k (or a fixture with < nProbes vectors)
    // yields fewer truth rows, and dividing by the nominal product
    // would silently understate recall (ADVICE r15)
    val hit = got.join(truth, Seq("probe_id", "neighbor_id")).count()
    val truthN = truth.count()
    println(f"[annprobe] recall path=$path k=$k " +
      f"recall=${hit.toDouble / truthN}%.3f")
    spark.stop()
  }
}
