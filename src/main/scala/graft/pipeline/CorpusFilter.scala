package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-corpus filter — the pipeline a pretraining data
  * run actually executes, chaining the already-audited operators:
  *
  *   1. quality gate ([[TextOps.withQuality]] — C4/Gopher-style
  *      heuristics, pure projection);
  *   2. exact-dup keeper ([[Dedup.exactClusters]] — one md5 groupBy;
  *      only the min-id copy of each byte-identical text survives);
  *   3. near-dup drop ([[Dedup.nearDupPairs]] — MinHash-LSH + verify;
  *      the LARGER id of every verified pair is dropped, the greedy
  *      pairwise rule: unlike connected-component resolution (pl_d3) it
  *      needs no iteration, at the cost of over-dropping long chains —
  *      both rules never keep two docs that pair with each other).
  *
  * Composition adds two joins on top of the stages' own audited plans:
  * a shuffle semi-join against the keeper set (corpus-scale — NOT
  * broadcast) and an anti-join against the pair-loser set. The loser
  * set (∝ verified dup pairs) is pulled to the driver as a local
  * relation: that is the same "fits one node" bound a broadcast join
  * needs anyway, and it lets [[Dedup.nearDupPairs]]'s materialized pair
  * blocks be released immediately — after `kept` returns, the pipeline
  * holds ZERO persisted blocks (asserted by PipelineSpec). A corpus
  * whose loser set outgrows the driver should compose nearDupPairs +
  * a distributed anti-join directly instead.
  */
object CorpusFilter {

  /** Kept documents as (doc_id, n_tokens). */
  def kept(docs: DataFrame, minJaccard: Double = 0.7): DataFrame = {
    val q = TextOps.withQuality(docs)
    val exactKeepers = Dedup.exactClusters(docs)
      .select(col("keeper").as("doc_id")).distinct()
    val pairs = Dedup.nearDupPairs(docs, minJaccard)
    val loserIds =
      try pairs.select(col("doc2")).distinct().collect().map(_.getLong(0))
      finally Caches.release(pairs)
    val spark = docs.sparkSession
    import spark.implicits._
    val nearDupLosers = loserIds.toSeq.toDF("doc_id")
    q.filter(col("keep"))
      .join(exactKeepers, Seq("doc_id"), "semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select("doc_id", "n_tokens")
  }
}
