package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for the graph-centrality family (pl_g1):
  * integer-exact PageRank over a synthetic crawl-shaped edge list at
  * three decades of |E|, verifying the operator's scale claim — each
  * iteration costs two keyed shuffles of the EDGE list and nothing
  * else, so the wall is linear in |E| and independent of any corpus.
  *
  * The synthetic graph is deterministic (xxhash64 endpoints): 80 % of
  * edges land uniformly, 20 % into the 1 % hub prefix — the
  * boilerplate-template skew a real near-dup graph shows (a hub doc
  * near-duplicate to thousands). The probe reports nodes, max
  * in-degree, the build wall (edge materialize + the n-node guard
  * count), the full pagerank wall at `iters` and at 1 iteration (the
  * marginal per-iteration cost is the honest number — fixed costs
  * bill to the 1-iteration run), and total mass (the conservation
  * sanity: ≤ n·scale by the damping argument).
  *
  * Usage: runMain graft.GraphProbe <nEdges> [<nNodes> <iters>]
  * One probe per JVM (DESIGN.md probe discipline).
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nNodes = args.lift(1).map(_.toLong).getOrElse(math.max(nEdges / 10, 4L))
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
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

    val hubs = math.max(nNodes / 100, 1L)
    val pairs = spark.range(nEdges)
      .select(
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("doc1"),
        when(pmod(xxhash64(col("id"), lit(3)), lit(100L)) < 20L,
          pmod(xxhash64(col("id"), lit(2)), lit(hubs)))
          .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(nNodes)))
          .as("doc2"))
      .filter(col("doc1") =!= col("doc2"))
    val scale = 100000000L // guard-safe to 5.4e9 nodes

    def run(it: Int): (Long, Double, Double, Long, Long, Long) = {
      val (pr, w, c) = timed {
        val res = graft.pipeline.Graph.pagerankScaled(pairs, it, scale)
        val row = res.agg(count(lit(1)), max(col("outdeg")),
          sum(col("pr_scaled")), max(col("pr_scaled"))).head()
        graft.pipeline.Caches.release(res)
        row
      }
      (pr.getLong(0), w, c, pr.getLong(1), pr.getLong(2), pr.getLong(3))
    }

    run(1) // discarded: absorbs JIT + codegen warmup
    val (n1, w1, c1, _, _, _) = run(1)
    val (n, w, c, maxDeg, mass, maxPr) = run(iters)
    println(f"[graphprobe] edges=$nEdges nodes=$n maxdeg=$maxDeg " +
      f"iters=$iters wall=$w%.2f cpu=$c%.1f wall_1iter=$w1%.2f " +
      f"marginal_per_iter=${(w - w1) / math.max(iters - 1, 1)}%.2f " +
      f"mass=$mass mass_bound=${n * scale} maxpr_x=${maxPr.toDouble / scale}%.1f")
    // require, not assert (ADVICE r16): -Xelide-below strips assert,
    // and a stripped build silently skipping the conservation sanity
    // is exactly the failure mode the probe exists to report
    require(n == n1, "node set must not depend on iteration count")
    require(mass <= n * scale, "mass bound violated — damping argument broken")
    spark.stop()
  }
}
