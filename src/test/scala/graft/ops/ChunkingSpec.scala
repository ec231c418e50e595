package graft.ops

import graft.SparkSpec
import graft.ms.MsTables

/** The plan-stats pass: A7 statistics + the W1 monotonicity hard-fail
  * the reference enforces before averaging (chunking.py:287-289).
  */
class ChunkingSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("fixture MS passes validation with correct plan stats") {
    val main = Flags.filterAutocorr(MsTables.main(spark))
    val st = Chunking.validate(main, "spec")
    assert(st.monotonicViolations == 0)
    assert(st.nRows == main.count())
    assert(st.nTimes == 4)
    assert(st.intervalMean == 30000.0)
  }

  test("monotonicity checks FILE order, surviving a shuffle above the scan") {
    // Write a deliberately time-REVERSED single-file MS main, read it
    // back, and repartition: the check must still see the stored file
    // order (via _metadata), not the shuffle order.
    val dir = "/tmp/graft_test/chunking_reversed"
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    (0 until 8).map(t => (0, 0, 0, 1, 2, 100.0 - t, 1.0, Seq(1.0, 0.0, 0.0)))
      .toDF("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER", "ANTENNA1",
        "ANTENNA2", "TIME", "INTERVAL", "UVW")
      .coalesce(1)
      .sortWithinPartitions(org.apache.spark.sql.functions.col("TIME").desc)
      .write.parquet(dir)
    val bad = spark.read.parquet(dir).repartition(8)
    assert(Chunking.planStats(bad).monotonicViolations == 7,
      "reversed file order must violate at every adjacent pair")
    // and a well-ordered file-backed frame keeps passing after a shuffle
    val good = Flags.filterAutocorr(MsTables.main(spark)).repartition(8)
    assert(Chunking.planStats(good).monotonicViolations == 0,
      "a repartition above the scan must not fabricate violations")
  }

  test("non-monotonic TIME is rejected") {
    // one baseline whose second row goes BACK in time
    val bad = Seq(
      (0, 0, 0, 1, 2, 10.0, 1.0, Seq(1.0, 0.0, 0.0)),
      (0, 0, 0, 1, 2, 5.0, 1.0, Seq(1.0, 0.0, 0.0)))
      .toDF("FIELD_ID", "DATA_DESC_ID", "SCAN_NUMBER", "ANTENNA1",
        "ANTENNA2", "TIME", "INTERVAL", "UVW")
      .coalesce(1) // pin the stored order the check runs over
    val e = intercept[IllegalArgumentException] {
      Chunking.validate(bad, "spec")
    }
    assert(e.getMessage.contains("monotonicity"))
  }
}
