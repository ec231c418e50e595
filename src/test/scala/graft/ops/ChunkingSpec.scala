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
