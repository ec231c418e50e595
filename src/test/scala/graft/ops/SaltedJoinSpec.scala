package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SaltedJoin: salting must be semantically invisible (result equals
  * the plain inner join) while spreading hot keys across salts.
  */
class SaltedJoinSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("salted join equals plain join on a skewed fact") {
    // hot key 7 carries 1000 rows; keys 1/2 one row each; key 99 dangles
    val fact = ((1 to 1000).map(i => (i.toLong, 7L)) ++
      Seq((2000L, 1L), (2001L, 2L), (2002L, 99L)))
      .toDF("row_id", "k")
    val dim = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (3L, "unused"))
      .toDF("dk", "name")
    val salted = SaltedJoin.join(fact, dim, "k", "dk", col("row_id"), 8)
      .select("row_id", "k", "dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "k", "dk", "name")
    val a = salted.collect().map(_.toSeq).sortBy(_.toString)
    val b = plain.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == 1002)
    assert(a.toSeq == b.toSeq)
  }

  test("hot key rows actually spread over multiple salts") {
    val fact = (1 to 1000).map(i => (i.toLong, 7L)).toDF("row_id", "k")
    // the REAL salting path, not a re-implementation of it
    val n = SaltedJoin.saltedFact(fact, col("row_id"), 8)
      .select("_graft_salt").distinct().count()
    assert(n == 8L, s"expected the hot key spread over 8 salts, got $n")
  }

  test("non-integral (double) salt source: no rows dropped (ADVICE r7)") {
    // a DOUBLE saltSource used to produce fractional salts that never
    // equalled the dim side's integers — rows silently vanished
    val fact = Seq((0.25, 7L), (1.5, 7L), (-2.75, 7L), (3.0, 1L))
      .toDF("value", "k")
    val dim = Seq((7L, "hot"), (1L, "a")).toDF("dk", "name")
    val out = SaltedJoin.join(fact, dim, "k", "dk", col("value"), 8)
    assert(out.count() == 4, "fractional saltSource must not drop rows")
  }

  test("null salt source joins like the plain join; _graft_salt input rejected") {
    val fact = Seq((Some(1L), 7L), (None, 7L)).toDF("row_id", "k")
    val dim = Seq((7L, "hot")).toDF("dk", "name")
    val out = SaltedJoin.join(fact, dim, "k", "dk", col("row_id"), 8)
    assert(out.count() == 2, "NULL saltSource row must not be dropped")
    val poisoned = fact.withColumn("_graft_salt", lit(9))
    intercept[IllegalArgumentException] {
      SaltedJoin.join(poisoned, dim, "k", "dk", col("row_id"), 8)
    }
  }
}
