package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage task-skew telemetry for a single pipeline run (VERDICT r9
  * #6: does the LSH verification join's doc-keyed shuffle skew under a
  * hot doc?). Registers a SparkListener, runs `nearDupPairs` over the
  * given corpus, and prints — for every stage with shuffle input — the
  * task count and the median/max task duration and shuffle-read bytes.
  * Skew shows up as max ≫ median on the verification-join stages; a
  * balanced shuffle reads max/median ≲ 2-3 (the last-task long tail of
  * a 32-thread local run), a hot key reads 10×+.
  *
  * Usage: runMain graft.SkewProbe <sfDir> [minJaccard]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val minJ = args.lift(1).map(_.toDouble).getOrElse(0.7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class T(durMs: Long, shuffleRead: Long, rows: Long)
    val tasks = mutable.Map.empty[Int, mutable.ArrayBuffer[T]]
    val stageNames = mutable.Map.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val m = e.taskMetrics
        if (m != null) {
          val sr = m.shuffleReadMetrics
          tasks.getOrElseUpdate(e.stageId, mutable.ArrayBuffer.empty) +=
            T(m.executorRunTime, sr.totalBytesRead, sr.recordsRead)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          stageNames(e.stageInfo.stageId) =
            e.stageInfo.name.takeWhile(_ != '\n').take(60)
        }
    })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = graft.pipeline.Dedup.nearDupPairs(docs, minJ)
    val n = pairs.count()
    val wall = (System.nanoTime() - t0) / 1e9
    graft.pipeline.Caches.releaseQuiet(pairs)
    Thread.sleep(500) // drain the listener bus

    println(f"[skew] corpus=$sfDir pairs=$n wall=$wall%.1fs")
    def med(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0 else xs.sorted.apply(xs.size / 2)
    val interesting = tasks.toSeq
      .filter { case (_, ts) => ts.map(_.shuffleRead).sum > 0 }
      .sortBy { case (_, ts) => -ts.map(_.shuffleRead).sum }
    interesting.foreach { case (sid, ts) =>
      val durs = ts.map(_.durMs).toSeq
      val reads = ts.map(_.shuffleRead).toSeq
      val recs = ts.map(_.rows).toSeq
      println(f"[skew] stage=$sid%-4d tasks=${ts.size}%-3d " +
        f"dur med/max=${med(durs)}/${durs.max}ms " +
        f"read med/max=${med(reads)}/${reads.max}B " +
        f"recs med/max=${med(recs)}/${recs.max} " +
        f"(${stageNames.getOrElse(sid, "?")})")
    }
    spark.stop()
  }
}
