package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate keys on exact name correspondence
  * between `SparkEntry.queries` and `SparkEntry.oracleSql` — a typo'd
  * oracle key silently downgrades that entry to a weaker rows-only
  * check, and an oracle without a query is dead SQL. Pure map checks,
  * no Spark session.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }

  test("every registered query is oracle-checked") {
    // no current entry is exempt; if a genuinely non-SQL-expressible
    // op ever lands, list it here explicitly instead of weakening the
    // assertion
    val exempt = Set.empty[String]
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- exempt
    assert(unchecked.isEmpty, s"queries with no oracle: $unchecked")
  }

  test("module registries do not shadow each other's entries") {
    val all = Seq(
      "relational" -> graft.queries.RelationalQueries.queries.keySet,
      "ms" -> graft.queries.MsQueries.queries.keySet,
      "bda" -> graft.queries.BdaQueries.queries.keySet,
      "uvw" -> graft.queries.UvwQueries.queries.keySet,
      "event" -> graft.queries.EventQueries.queries.keySet,
      "pipeline" -> graft.queries.PipelineQueries.queries.keySet,
      "multimodal" -> graft.queries.MultimodalQueries.queries.keySet,
      "streaming" -> graft.queries.StreamingQueries.queries.keySet)
    for (Seq((m1, k1), (m2, k2)) <- all.combinations(2)) {
      val overlap = k1 & k2
      assert(overlap.isEmpty, s"$m1 and $m2 both register: $overlap")
    }
  }
}
