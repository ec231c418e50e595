package graft.ms

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Parquet MS sink (SURVEY §2.1 S7–S10).
  *
  * Mirrors the reference's output lifecycle:
  *  - S10 overwrite guard — refuse an existing output unless forced, then
  *    remove it first (/root/reference/xova/apps/xova/app.py:152-159).
  *  - S7/S8 main + regenerated-subtable writes (app.py:107-118).
  *  - S9 verbatim passthrough of every untouched subtable
  *    (/root/reference/xova/apps/xova/subtables.py:9-37) — a parquet
  *    re-write (not a filesystem copy) so it works on any Hadoop-visible
  *    storage and keeps subtable data going through the same IO layer.
  */
object MsWriter {

  /** Subtables the averaging pipeline regenerates itself. */
  val Regenerated = Set("main", "SPECTRAL_WINDOW", "DATA_DESCRIPTION")

  /** S10: returns normally iff writing may proceed. */
  def guard(outRoot: String, force: Boolean): Unit = {
    val p = Paths.get(outRoot)
    if (Files.exists(p)) {
      if (!force)
        throw new IllegalStateException(
          s"output $outRoot exists; pass force=true to overwrite")
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
  }

  /** S7/S8: one table of the output MS. `partitionCols` hive-partitions
    * the layout (used for `main`: the reference's natural group key, so
    * field/scan selections on the written MS partition-prune at the
    * source — SURVEY §4 O3). Callers must sort with the partition
    * columns as a prefix, or the writer inserts its own (unstable)
    * partition sort and scrambles the within-file TIME order.
    */
  def writeTable(df: DataFrame, outRoot: String, table: String,
                 partitionCols: Seq[String] = Nil,
                 maxRecordsPerFile: Long = 0): Unit = {
    var w = df.write.mode(SaveMode.ErrorIfExists)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$outRoot/$table")
  }

  /** S9: copy through every subtable of the input MS that the pipeline
    * did not regenerate. The ~9 subtables are tiny independent writes to
    * distinct directories, so they run as CONCURRENT Spark jobs — on a
    * cluster this collapses ~9 sequential driver→executor round-trips
    * into one wave (and locally it hides per-job scheduling overhead).
    */
  def passthrough(spark: SparkSession, inRoot: String, outRoot: String): Seq[String] = {
    val in = Paths.get(inRoot)
    val tables = Files.list(in).toArray.toSeq.map(_.asInstanceOf[Path])
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filterNot(Regenerated)
      .sorted
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val writes = tables.map { t =>
      Future(writeTable(spark.read.parquet(s"$inRoot/$t"), outRoot, t))
    }
    Await.result(Future.sequence(writes), Duration.Inf)
    tables
  }
}
