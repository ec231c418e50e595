package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over document-similarity edges — the curation
  * family that treats the corpus as a graph (near-dup pairs, link
  * structure, citation edges) and ranks documents by connectivity:
  * PageRank-style centrality picks the canonical member of a dup
  * cluster, flags template/boilerplate hubs (a document near-duplicate
  * to hundreds of others is almost always machine-generated), and
  * scores crawl authority before quality filtering.
  *
  * Numeric contract (the repo-wide integer-exactness strategy): rank
  * mass is carried as int64 on a caller-chosen `scale` grid and every
  * iteration is pure integer arithmetic — per-edge contributions are
  * FLOOR-divided (`div`) once, and the per-node combine is an int64
  * SUM, which is exact and therefore combine-order-independent (the
  * reason float PageRank can never be hash-gated across engines:
  * Σ double over an arbitrary in-degree is order-sensitive; Σ int64 is
  * not). The result is a deterministic quantization of damped PageRank
  * within in-degree/`scale` of the real-valued fixed point per node per
  * iteration — at the default scale the quantization noise is ~1e-9 of
  * a rank unit, far below any curation decision threshold — and the
  * oracle replays it with `//` on identical integers, so hashes match
  * bit-for-bit.
  */
object Graph {

  /** Damping 17/20 = 0.85, kept rational (numerator [[DampNum]] over
    * denominator [[DampDen]]) so iterations stay in int64.
    */
  val DampNum = 17L
  val DampDen = 20L

  /** Integer-scaled damped PageRank over an UNDIRECTED pair list
    * (`doc1`, `doc2`) — each pair contributes both directed edges.
    * Every node starts with mass `scale`; each of `iterations` rounds
    * computes, per node v,
    *
    *   r'(v) = (3·scale) div 20  +  Σ_{u→v} (r(u)·17) div (20·outdeg(u))
    *
    * i.e. standard unnormalized damped PageRank on a `scale` integer
    * grid. Returns one row per node that has at least one edge
    * (isolated documents never move off the damping base — their rank
    * is the constant `(3·scale) div 20` and carrying them through the
    * joins would only pad the frame): (doc_id, outdeg, pr_scaled, pr)
    * with `pr = pr_scaled / scale` rounded to 6 for display; `pr_scaled`
    * is the exact integer the hash gate rides on.
    *
    * Scale: the edge list is the banded-LSH near-dup output (or a real
    * link graph) — orders of magnitude smaller than the corpus — and is
    * materialized once; each iteration is two keyed shuffles of that
    * edge list (join rank on src, re-aggregate on dst), never a corpus
    * scan, so 3 iterations cost 6 bounded exchanges regardless of
    * corpus size. Overflow is guarded driver-side like the BM25 int64
    * bound: a single node's mass is bounded by the conserved total
    * n·scale, so `17·n·scale ≤ Long.Max` must hold — at 10⁹ graph nodes
    * drop `scale` to 10⁸ and the rank still carries 8 significant
    * digits. The one driver-side action is the n-node count on the
    * (tiny) node set, the same class of accepted cost as BM25's corpus
    * stats row.
    */
  def pagerankScaled(pairs: DataFrame, iterations: Int = 3,
                     scale: Long = 1000000000L): DataFrame = {
    val (plan, edges) = pagerankPlan(pairs, iterations, scale)
    // materialize the node-sized result so the edge checkpoint can
    // release NOW (the Caches discipline: the only storage a call
    // leaves behind is its own result, which Verify/Bench sweep)
    try Caches.materialize(plan)
    finally Caches.release(edges)
  }

  /** Personalized (seeded) PageRank — same integer-exact recurrence as
    * [[pagerankScaled]], but mass originates at and teleports back to
    * a SEED set instead of uniformly:
    *
    *   r0(v)  = scale · [v ∈ seeds]
    *   r'(v)  = (3·scale) div 20 · [v ∈ seeds]
    *            + Σ_{u→v} (r(u)·17) div (20·outdeg(u))
    *
    * The curation reading: seeds = the decontamination hit list, edges
    * = the near-dup graph, and the rank measures TRANSITIVE
    * contamination risk — a doc that near-duplicates a doc that
    * near-duplicates a benchmark hit picks up mass even though its own
    * n-gram overlap check came back clean (the "paraphrase of a
    * paraphrase" leak the direct gram guard cannot see). Nodes
    * unreachable from any seed hold rank exactly 0 — integer zero, not
    * epsilon — so "risk > 0" is a crisp reachability statement.
    *
    * `seeds` is a (doc_id)-keyed frame; seed membership is resolved
    * with one left join against the node set. Returns (doc_id,
    * outdeg, is_seed, pr_scaled, pr). The int64 bound tightens to
    * 17·|seeds ∩ nodes|·scale ≤ Long.Max (total mass is conserved
    * below the SEED mass, not the node mass — personalization makes
    * the guard cheaper, not dearer). Same two edge-list shuffles per
    * iteration; the result is materialized and the edge checkpoint
    * released, as in [[pagerankScaled]].
    */
  def personalizedPagerank(pairs: DataFrame, seeds: DataFrame,
      iterations: Int = 3, scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      s"iterations out of range: $iterations")
    require(scale >= 1000L, s"scale too coarse: $scale")
    val fwd = pairs.select(col("doc1").cast("long").as("src"),
      col("doc2").cast("long").as("dst"))
    val edges = Caches.materialize(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))
    try {
      val deg = edges.groupBy("src")
        .agg(count(lit(1)).cast("long").as("outdeg"))
      val seedIds = seeds.select(col("doc_id").cast("long").as("id"))
        .distinct()
      val nodes = deg.select(col("src").as("id"), col("outdeg"))
        .join(seedIds.withColumn("_s", lit(true)), Seq("id"), "left")
        .withColumn("is_seed", col("_s").isNotNull).drop("_s")

      val nSeeds = nodes.filter(col("is_seed")).count()
      require(BigInt(DampNum) * math.max(nSeeds, 1L) * scale <= Long.MaxValue,
        s"ppr int64 bound exceeded (seeds=$nSeeds, scale=$scale): " +
          "lower scale — rank resolution degrades gracefully")

      val base = (3L * scale) / DampDen
      val degEdges = edges.join(deg, "src")
      var r = nodes.select(col("id"),
        when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("r"))
      for (_ <- 1 to iterations) {
        val inbound = degEdges.join(r, col("id") === col("src"))
          .select(col("dst"),
            expr(s"(r * $DampNum) div (${DampDen}L * outdeg)").as("contrib"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("contrib")).as("s"))
        r = nodes.join(inbound, Seq("id"), "left")
          .select(col("id"),
            (when(col("is_seed"), lit(base)).otherwise(lit(0L))
              + coalesce(col("s"), lit(0L))).as("r"))
      }
      Caches.materialize(
        r.join(nodes, "id")
          .select(col("id").as("doc_id"), col("outdeg"), col("is_seed"),
            col("r").as("pr_scaled"),
            round(col("r").cast("double") / lit(scale).cast("double"), 6)
              .as("pr")))
    } finally Caches.release(edges)
  }

  /** The LAZY rank plan plus the MATERIALIZED edge checkpoint it rides
    * (callers of [[pagerankScaled]] never see either — the public
    * wrapper materializes the result and releases the edges; this
    * split exists so plan-shape tests can inspect the iteration plan
    * before checkpointing truncates it to a LogicalRDD scan).
    */
  private[graft] def pagerankPlan(pairs: DataFrame, iterations: Int,
      scale: Long): (DataFrame, DataFrame) = {
    require(iterations >= 1 && iterations <= 16,
      s"iterations out of range: $iterations")
    require(scale >= 1000L, s"scale too coarse: $scale")
    val fwd = pairs.select(col("doc1").cast("long").as("src"),
      col("doc2").cast("long").as("dst"))
    val edges = Caches.materialize(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))

    // int64 bound: total mass stays ≤ n·scale under damping (0.15 base
    // + 0.85 redistribution of a conserved-or-shrinking total), so the
    // largest value r·17 can reach is 17·n·scale. Fail loudly, never
    // wrap (Spark non-ANSI) while the oracle raises.
    val nNodes = edges.select(col("src")).distinct().count()
    require(BigInt(DampNum) * nNodes * scale <= Long.MaxValue,
      s"pagerank int64 bound exceeded (nodes=$nNodes, scale=$scale): " +
        "lower scale — rank resolution degrades gracefully")

    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("long").as("outdeg"))
    val base = (3L * scale) / DampDen
    val degEdges = edges.join(deg, "src")

    // r(id): every node with an edge (undirected ⇒ outdeg ≥ 1 and
    // indeg ≥ 1, so the per-dst aggregate below covers all of them)
    var r = deg.select(col("src").as("id"), lit(scale).as("r"))
    for (_ <- 1 to iterations) {
      r = degEdges.join(r, col("id") === col("src"))
        .select(col("dst"),
          expr(s"(r * $DampNum) div (${DampDen}L * outdeg)").as("contrib"))
        .groupBy(col("dst").as("id"))
        .agg((lit(base) + sum(col("contrib"))).as("r"))
    }
    val out = r.join(deg, col("id") === col("src"))
      .select(col("id").as("doc_id"), col("outdeg"),
        col("r").as("pr_scaled"),
        round(col("r").cast("double") / lit(scale).cast("double"), 6)
          .as("pr"))
    (out, edges)
  }
}
