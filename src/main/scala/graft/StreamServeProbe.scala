package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated scale probe for the streaming hier-IVF-SQ8 serve path
  * (st16, [[graft.pipeline.Ann.annIvfSq8HierStreamed]] — VERDICT r15
  * #8): builds the index once from an N× embeddings fixture, streams
  * P probe vectors in F micro-batch files against it, and reports
  *
  *  - per-batch input rows and wall (from the streaming progress
  *    events — the serve latency the endpoint shape actually pays),
  *  - the MEASURED per-probe candidate volume: the probes' routed
  *    cells are recomputed driver-side with the same integer argmin
  *    over the model's own quantized centroid table (the model is
  *    deterministic, so this is exact accounting, not an estimate)
  *    and joined against the list-size profile,
  *
  * versus the serve contract: each probe touches ~listProbes·corpus/k
  * candidate rows per micro-batch, independent of batch count, with
  * ZERO cross-batch state.
  *
  * Usage: runMain graft.StreamServeProbe <embDir> [P] [files] [listProbes]
  * One probe per JVM (DESIGN.md probe discipline).
  */
object StreamServeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: StreamServeProbe <embDir> [P] [files] [listProbes]")
    val dir = args(0)
    val p = args.lift(1).map(_.toLong).getOrElse(8L)
    val nFiles = args.lift(2).map(_.toInt).getOrElse(3)
    val lp = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVec = emb.count()
    val kk = math.max(8, (nVec / 250).toInt)
    val b = math.max(2, math.sqrt(kk.toDouble).round.toInt)
    require(p <= nVec, s"P=$p exceeds corpus size $nVec")

    // ---- candidate-volume accounting (batch-side, exact) ----
    // hierAssignModel is deterministic given (corpus, knobs): the
    // stream below builds the SAME lists and routes probes against the
    // SAME quantized centroids, so recomputing the routing driver-side
    // here is exact bookkeeping of what each micro-batch's equi-join
    // will touch.
    val (assigned, cents) = pipeline.Ann.hierAssignModel(
      emb, kk, b, 2, 100000L, 2, trainedCoarse = true)
    val listSizes = assigned.groupBy("cluster")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probeRows = pipeline.Ann.withScaled(emb.filter(col("vec_id") < p))
      .select("vec_id", "iv").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def d2(a: Array[Long], c: Array[Long]): Long = {
      var i = 0; var acc = 0L
      while (i < a.length) { val t = a(i) - c(i); acc += t * t; i += 1 }
      acc
    }
    val np = math.min(lp, cents.length)
    val perProbe = probeRows.map { case (pid, iv) =>
      val cells = cents.map { case (cid, qv) => (d2(iv, qv), cid) }
        .sorted.take(np).map(_._2)
      val cand = cells.map(c => listSizes.getOrElse(c, 0L)).sum
      (pid, cells, cand)
    }
    val contract = lp.toLong * nVec / kk
    val candTotal = perProbe.map(_._3).sum
    println(f"[serveprobe] model n_vec=$nVec k=$kk b=$b listProbes=$lp " +
      f"P=$p contract_cand/probe=$contract " +
      f"measured_cand/probe_avg=${candTotal / perProbe.length}%d " +
      f"min=${perProbe.map(_._3).min} max=${perProbe.map(_._3).max}")

    // ---- the streamed serve itself ----
    import java.io.File
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_serveprobe").toFile
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    try {
      val streamDir = new File(tmp, "stream"); streamDir.mkdirs()
      val staging = new File(tmp, "staging")
      emb.filter(col("vec_id") < p).repartition(nFiles).write
        .option("parquet.block.size", 2L * 1024 * 1024)
        .parquet(staging.getAbsolutePath)
      staging.listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          Files.move(f.toPath,
            new File(streamDir, f"$i%03d_part.parquet").toPath)
        }
      val src = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(streamDir.getAbsolutePath)
      val (served, serveIndex) = pipeline.Ann.annIvfSq8HierStreamedIndexed(
        src, emb, 5, kk, b, 2, 100000L, 2, trainedCoarse = true,
        listProbes = lp)
      val sink = new File(tmp, "sink")
      val ckpt = new File(tmp, "ckpt")
      val t0 = System.nanoTime()
      val q = served.writeStream.format("parquet")
        .option("path", sink.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode("append").start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress
      q.stop()
      pipeline.Caches.release(serveIndex)
      val rows = spark.read.parquet(sink.getAbsolutePath).count()
      progress.filter(_.numInputRows > 0).zipWithIndex.foreach {
        case (pr, i) =>
          println(f"[serveprobe] batch=$i in_rows=${pr.numInputRows} " +
            f"batch_ms=${pr.durationMs.get("triggerExecution")}")
      }
      println(f"[serveprobe] total out_rows=$rows wall=$wall%.2f s " +
        f"(build+serve; zero cross-batch state by construction)")
    } finally {
      rm(tmp)
      spark.stop()
    }
  }
}
