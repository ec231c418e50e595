package graft.cli

import org.apache.spark.sql.SparkSession
import graft.ops.{Bda, Check, Timechannel, Uvw}

/** The application entry point (SURVEY §3 E1–E3): parse → run pipeline →
  * fixms post-pass, mirroring the reference lifecycle
  * (/root/reference/xova/apps/xova/app.py:46-159).
  *
  * `xova timechannel MS -t 2.0 -c 16`, `xova bda MS -d 0.99 -fov 15`,
  * `xova check MS`.
  */
object XovaApp {

  def main(argv: Array[String]): Unit = {
    val cmd = Arguments.parse(argv.toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cmd, fixUvw = true)
    finally spark.stop()
  }

  /** @param fixUvw the reference's default post-pass: recompute UVW at
    *   the averaged time centroids (app.py:122-128) unless the user
    *   asked for averaged coordinates.
    */
  def run(spark: SparkSession, cmd: Arguments.Command, fixUvw: Boolean): Unit =
    cmd match {
      case Arguments.TimechannelCmd(ms, out, args) =>
        val tables = Timechannel.run(spark, ms, out, args)
        println(s"[xova] timechannel: wrote ${tables.mkString(", ")} to $out")
        if (fixUvw) { Uvw.fixms(spark, out); println("[xova] fixms: UVW recomputed") }
      case Arguments.BdaCmd(ms, out, args) =>
        val tables = Bda.run(spark, ms, out, args)
        println(s"[xova] bda: wrote ${tables.mkString(", ")} to $out")
        if (fixUvw) { Uvw.fixms(spark, out); println("[xova] fixms: UVW recomputed") }
      case Arguments.CheckCmd(ms) =>
        val r = Check.run(spark, ms)
        println(s"[xova] check: $ms conforms ($r)")
    }
}
