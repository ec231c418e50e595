package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated probe for the IVF list LAYOUT question: at 10⁹ vectors an
  * inverted-list index is a STORAGE layout, not just a plan — a probe
  * should open only its lists' FILES, not scan-and-filter the corpus.
  * Two physical designs for the same hier-routed lists
  * ([[graft.pipeline.Ann.hierAssignModel]]):
  *
  *  - `flat`: one parquet directory, `cluster` an ordinary column —
  *    a probe's list read is a full scan + filter (row-group skipping
  *    at best, and only if the writer happened to sort by cluster);
  *  - `part`: `write.partitionBy("cluster")` — each list is its own
  *    directory, the probe's IN-filter becomes a catalog-level
  *    PartitionFilter, and the scan TOUCHES only p directories of k
  *    (file-level pruning independent of parquet stats).
  *
  * The probe builds both layouts once, then times R repeated
  * list-reads (count over the probed lists' SQ8-ready columns) per
  * layout and prints the executed scan line so the PartitionFilters
  * / PushedFilters difference is auditable. One probe per JVM.
  *
  * Usage: runMain graft.IvfLayoutProbe <embDir> [reads] [listProbes]
  */
object IvfLayoutProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfLayoutProbe <embDir> [reads] [listProbes]")
    val dir = args(0)
    val reads = args.lift(1).map(_.toInt).getOrElse(20)
    val lp = args.lift(2).map(_.toInt).getOrElse(2)
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
    val k = math.max(8, (nVec / 250).toInt)
    val b = math.max(2, math.sqrt(k.toDouble).round.toInt)
    val (assigned, cents) = pipeline.Ann.hierAssignModel(
      emb, k, b, 2, 100000L, 2, trainedCoarse = true)
    val lists = assigned.select("vec_id", "iv", "norm2", "cluster")

    val base = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    // hygiene: both parquet layouts are probe-local; delete them even
    // when a timed stage throws (ADVICE r15 — the success-path-only
    // cleanup leaked the layouts on any build/read failure)
    try {
    val flatDir = s"$base/flat"
    val partDir = s"$base/part"
    val t0 = System.nanoTime()
    lists.write.mode("overwrite").parquet(flatDir)
    val tFlat = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    lists.write.mode("overwrite").partitionBy("cluster").parquet(partDir)
    val tPart = (System.nanoTime() - t1) / 1e9
    println(f"[ivflayout] build n_vec=$nVec k=$k write_flat=$tFlat%.1f s " +
      f"write_part=$tPart%.1f s")

    // the probed cells: first `lp` clusters by id — WHICH cells is
    // irrelevant to layout cost, only HOW MANY directories open.
    // INT literals, same type as the column: a string isin would
    // type-coerce to cast(cluster AS string) IN (…), which cannot be
    // pushed to parquet and would rig the flat layout's reading.
    val cells = cents.map(_._1).sorted.take(lp).toIndexedSeq
    def listRead(dirPath: String): org.apache.spark.sql.DataFrame =
      spark.read.parquet(dirPath)
        .filter(col("cluster").isin(cells: _*))
        .select("vec_id", "iv", "norm2")
    for ((tag, d) <- Seq("flat" -> flatDir, "part" -> partDir)) {
      val df = listRead(d)
      df.count() // warm the reader path once before timing
      System.gc()
      // fresh-read mode: every probe re-lists the directory tree (the
      // cost an uncatalogued object-store layout pays per query)
      val c0 = cpuSec; val t2 = System.nanoTime()
      var rows = 0L
      var i = 0
      while (i < reads) { rows = listRead(d).count(); i += 1 }
      val wall = (System.nanoTime() - t2) / 1e9
      val cpuFresh = cpuSec - c0
      // amortized mode: the relation (and its file index) is built
      // ONCE — a served index / catalog table; probes only re-filter
      val rel = spark.read.parquet(d)
      rel.filter(col("cluster").isin(cells: _*)).count()
      System.gc()
      val t3 = System.nanoTime()
      i = 0
      while (i < reads) {
        rows = rel.filter(col("cluster").isin(cells: _*))
          .select("vec_id", "iv", "norm2").count()
        i += 1
      }
      val wallA = (System.nanoTime() - t3) / 1e9
      val scanLine = df.queryExecution.executedPlan.toString.linesIterator
        .find(_.contains("FileScan")).getOrElse("?").trim.take(220)
      println(f"[ivflayout] $tag reads=$reads rows/list_set=$rows " +
        f"fresh wall=$wall%.2f cpu=$cpuFresh%.2f per_read=${wall / reads}%.3f | " +
        f"amortized wall=$wallA%.2f per_read=${wallA / reads}%.3f")
      println(s"[ivflayout] $tag scan: $scanLine")
    }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      spark.stop()
    }
  }
}
