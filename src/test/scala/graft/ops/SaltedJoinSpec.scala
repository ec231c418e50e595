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
    val n = fact.withColumn("_salt", pmod(col("row_id"), lit(8)))
      .select("_salt").distinct().count()
    assert(n == 8L, s"expected the hot key spread over 8 salts, got $n")
  }
}
