package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for the INCREMENTAL PPR serve (st18's
  * pprAddSeeds vs st17's full re-score): at the staged-stream fixture
  * the two tie, because each of 3 batches injects a third of all seeds
  * — the delta frontier spans the graph. The operator's scale claim is
  * about the PRODUCTION regime instead: a standing seed set with a
  * SMALL per-batch delta ("two new benchmark hits landed"), where the
  * full re-score pays O(edges·iters) regardless and the delta pays
  * only the delta-reachable frontier's out-edges. This probe measures
  * exactly that: build GraphProbe's synthetic crawl-shaped graph, fold
  * in a standing seed population (1 % of nodes), then serve ONE batch
  * of `deltaSeeds` new seeds both ways and report the two walls plus
  * the bit-equality of their final scores (the exactness contract —
  * always checked, never assumed).
  *
  * Usage: runMain graft.PprDeltaProbe <nEdges> [<nNodes> <deltaSeeds>]
  * One probe per JVM (DESIGN.md probe discipline).
  */
object PprDeltaProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nNodes = args.lift(1).map(_.toLong).getOrElse(math.max(nEdges / 10, 4L))
    val nDelta = args.lift(2).map(_.toLong).getOrElse(2L)
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

    // GraphProbe's deterministic crawl-shaped graph (80 % uniform,
    // 20 % into the 1 % hub prefix)
    val hubs = math.max(nNodes / 100, 1L)
    val pairs = spark.range(nEdges)
      .select(
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("doc1"),
        when(pmod(xxhash64(col("id"), lit(3)), lit(100L)) < 20L,
          pmod(xxhash64(col("id"), lit(2)), lit(hubs)))
          .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(nNodes)))
          .as("doc2"))
      .filter(col("doc1") =!= col("doc2"))
    val scale = 100000000L
    val iters = 3

    import graft.pipeline.{Caches, Graph}
    val (ix, wBuild, _) = timed(Graph.buildIndex(pairs))
    // standing seeds: 1 % of nodes; delta: nDelta fresh nodes
    val standing = ix.nodes.filter(pmod(col("id"), lit(100L)) === 7L)
      .select(col("id").as("doc_id"))
    val delta = ix.nodes.filter(pmod(col("id"), lit(100L)) === 11L)
      .select(col("id").as("doc_id")).orderBy("doc_id").limit(nDelta.toInt)

    // standing state (cost excluded from both serve measurements)
    var st = Graph.pprInit(ix, iters, scale)
    val st1 = Graph.pprAddSeeds(ix, st, standing); st.release(); st = st1

    // serve path A: delta fold (st18)
    val (stD, wDelta, cDelta) = timed {
      Graph.pprAddSeeds(ix, st, delta)
    }
    // serve path B: full re-score on the union (st17)
    val (full, wFull, cFull) = timed {
      Graph.pprOnIndex(ix, standing.union(delta), iters, scale)
    }
    // exactness: bit-equality of the two scorings
    val dScores = Graph.pprScores(stD)
      .select(col("doc_id"), col("pr_scaled").as("d_pr"))
    val nDiff = full.join(dScores, "doc_id")
      .filter(col("pr_scaled") =!= col("d_pr")).count()
    val nRows = full.count()
    println(f"[pprdelta] edges=$nEdges nodes=${ix.nNodes} " +
      f"standing=${st.layers.filter(col("is_seed")).count()} delta=$nDelta " +
      f"build=$wBuild%.2f s | delta_serve wall=$wDelta%.2f cpu=$cDelta%.2f" +
      f" | full_rescore wall=$wFull%.2f cpu=$cFull%.2f | " +
      f"rows=$nRows diff=$nDiff")
    require(nDiff == 0L, s"delta serve diverged from full re-score: $nDiff")
    st.release(); stD.release(); Caches.release(full); ix.release()
    spark.stop()
  }
}
