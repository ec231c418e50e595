package graft

import org.apache.spark.sql.functions._

/** The N× events builder must preserve per-user sequence structure
  * exactly (copies are user-disjoint translations) — the property the
  * streaming scale probes' state accounting relies on.
  */
class ScaleFixturesSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def mkEvents() = {
    val rows = Seq(
      (0L, "2024-01-01T10:00:00", 3L, "click", 1.25, "{}"),
      (1L, "2024-01-01T10:30:00", 3L, "purchase", 2.5, "{}"),
      (2L, "2024-01-01T11:00:00", 7L, "click", 0.75, null: String))
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("3x scale: user-disjoint copies, sequences translated exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale").toFile
    try {
      mkEvents().write.mode("overwrite")
        .parquet(s"${dir.getAbsolutePath}/events.parquet")
      val out = ScaleFixtures.scaledEvents(s, dir.getAbsolutePath, 3)
      assert(out.count() == 9)
      // user strides: max user 7 -> stride 8; copies {3,7}, {11,15}, {19,23}
      assert(out.select("user_id").distinct().as[Long].collect().sorted
        .toSeq == Seq(3L, 7L, 11L, 15L, 19L, 23L))
      // per-copy sequences identical: same (ts, event_type, value) multiset
      // per translated user, and event ids unique across the output
      val perUser = out.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("ts"), col("event_type"),
          col("value")))).cast("string").as("seq"))
        .select(pmod(col("user_id"), lit(8L)).as("base_user"), col("seq"))
        .distinct()
      assert(perUser.count() == 2, "each base user has ONE sequence shape")
      assert(out.select("event_id").distinct().count() == 9)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
