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

  /** The materialized graph index every rank call iterates over —
    * built ONCE per graph by [[buildIndex]] and shared across rank
    * variants and serving batches (build-once-serve-many, like the
    * ANN serve index):
    *
    *   - `degEdges`: the doubled directed edge list annotated with the
    *     source's out-degree, (src, dst, outdeg) — the ONLY frame an
    *     iteration joins, so the degree aggregation executes exactly
    *     once per graph instead of replaying inside every iteration's
    *     lineage (r16 VERDICT #6);
    *   - `nodes`: the node-sized (id, outdeg) frame for seed flags and
    *     the final output join;
    *   - `nNodes`: the node count for the int64-overflow guard (the
    *     one driver-side action — over the tiny materialized nodes).
    *
    * Hand to [[EdgeIndex.release]] when done (the Caches discipline).
    */
  final case class EdgeIndex(degEdges: DataFrame, nodes: DataFrame,
      nNodes: Long) {
    def release(): Unit = {
      Caches.release(degEdges); Caches.release(nodes)
    }
  }

  /** Build the [[EdgeIndex]] from an UNDIRECTED pair list
    * (`doc1`, `doc2`) — each pair contributes both directed edges.
    * One definition shared by [[pagerankScaled]] and
    * [[personalizedPagerank]] (ADVICE r16: the two previously built
    * edges/deg/guard separately and could drift), and the static index
    * the st17 streaming serve re-scores against per batch.
    *
    * Scale: the edge list is the banded-LSH near-dup output (or a real
    * link graph) — orders of magnitude smaller than the corpus. The
    * raw doubled edge list is checkpointed only long enough to derive
    * the degree-annotated copy, then released — the index holds the
    * edge list (plus one long per edge) and the node list, nothing
    * corpus-sized.
    */
  def buildIndex(pairs: DataFrame): EdgeIndex = {
    val fwd = pairs.select(col("doc1").cast("long").as("src"),
      col("doc2").cast("long").as("dst"))
    val edges = Caches.materialize(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))
    try {
      val nodes = Caches.materialize(
        edges.groupBy("src")
          .agg(count(lit(1)).cast("long").as("outdeg"))
          .select(col("src").as("id"), col("outdeg")))
      val degEdges = Caches.materialize(
        edges.join(nodes.select(col("id").as("src"), col("outdeg")),
          "src"))
      EdgeIndex(degEdges, nodes, nodes.count())
    } finally Caches.release(edges)
  }

  /** One damped iteration's inbound mass: (id, s) with
    * s = Σ_{u→v} (r(u)·17) div (20·outdeg(u)) — a join + keyed sum over
    * the materialized degree-annotated edge list only (two bounded
    * exchanges per iteration, never a corpus scan).
    */
  private def inbound(ix: EdgeIndex, r: DataFrame): DataFrame =
    ix.degEdges.join(r, col("id") === col("src"))
      .select(col("dst"),
        expr(s"(r * $DampNum) div (${DampDen}L * outdeg)").as("contrib"))
      .groupBy(col("dst").as("id"))
      .agg(sum(col("contrib")).as("s"))

  private def checkIterScale(iterations: Int, scale: Long): Unit = {
    require(iterations >= 1 && iterations <= 16,
      s"iterations out of range: $iterations")
    require(scale >= 1000L, s"scale too coarse: $scale")
  }

  /** Integer-scaled damped PageRank over an UNDIRECTED pair list
    * (`doc1`, `doc2`). Every node starts with mass `scale`; each of
    * `iterations` rounds computes, per node v,
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
    * Scale: the [[EdgeIndex]] is built once (one edge-list shuffle for
    * the degree aggregation); each iteration is two keyed shuffles of
    * the annotated edge list (join rank on src, re-aggregate on dst),
    * so 3 iterations cost 6 bounded exchanges regardless of corpus
    * size. Overflow is guarded driver-side like the BM25 int64 bound:
    * a single node's mass is bounded by the conserved total n·scale,
    * so `17·n·scale ≤ Long.Max` must hold — at 10⁹ graph nodes drop
    * `scale` to 10⁸ and the rank still carries 8 significant digits.
    */
  def pagerankScaled(pairs: DataFrame, iterations: Int = 3,
                     scale: Long = 1000000000L): DataFrame = {
    val (plan, ix) = pagerankPlan(pairs, iterations, scale)
    // materialize the node-sized result so the index can release NOW
    // (the Caches discipline: the only storage a call leaves behind is
    // its own result, which Verify/Bench sweep)
    try Caches.materialize(plan)
    finally ix.release()
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
    * One-shot wrapper over [[buildIndex]] + [[pprOnIndex]]; a serving
    * deployment (or the st17 streaming twin) builds the index once and
    * calls [[pprOnIndex]] per seed-set revision.
    */
  def personalizedPagerank(pairs: DataFrame, seeds: DataFrame,
      iterations: Int = 3, scale: Long = 1000000000L): DataFrame = {
    checkIterScale(iterations, scale)
    val ix = buildIndex(pairs)
    try pprOnIndex(ix, seeds, iterations, scale)
    finally ix.release()
  }

  /** [[personalizedPagerank]] over a prebuilt [[EdgeIndex]] — the
    * serve path: the index is static, the seed set revises (st17
    * re-scores each micro-batch's accumulated decontamination hits
    * against it). `seeds` is a (doc_id)-keyed frame; seed membership
    * is resolved with one left join against the node set, and the
    * seed-flagged node frame is MATERIALIZED before the loop (ADVICE
    * r16: unmaterialized, the seed join replayed inside every
    * iteration's lineage). Returns the MATERIALIZED
    * (doc_id, outdeg, is_seed, pr_scaled, pr).
    *
    * The int64 bound tightens to 17·|seeds ∩ nodes|·scale ≤ Long.Max
    * (total mass is conserved below the SEED mass, not the node mass —
    * personalization makes the guard cheaper, not dearer). Same two
    * edge-list shuffles per iteration as [[pagerankScaled]], plus the
    * node-sized left join that re-bases seed teleport mass each round.
    */
  def pprOnIndex(ix: EdgeIndex, seeds: DataFrame,
      iterations: Int = 3, scale: Long = 1000000000L): DataFrame = {
    checkIterScale(iterations, scale)
    val seedIds = seeds.select(col("doc_id").cast("long").as("id"))
      .distinct()
    val nodes = Caches.materialize(
      ix.nodes.join(seedIds.withColumn("_s", lit(true)), Seq("id"), "left")
        .withColumn("is_seed", col("_s").isNotNull).drop("_s"))
    try {
      val nSeeds = nodes.filter(col("is_seed")).count()
      require(
        BigInt(DampNum) * math.max(nSeeds, 1L) * scale <= Long.MaxValue,
        s"ppr int64 bound exceeded (seeds=$nSeeds, scale=$scale): " +
          "lower scale — rank resolution degrades gracefully")

      val base = (3L * scale) / DampDen
      var r = nodes.select(col("id"),
        when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("r"))
      for (_ <- 1 to iterations) {
        r = nodes.join(inbound(ix, r), Seq("id"), "left")
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
    } finally Caches.release(nodes)
  }

  /** The LAZY rank plan plus the MATERIALIZED [[EdgeIndex]] it rides
    * (callers of [[pagerankScaled]] never see either — the public
    * wrapper materializes the result and releases the index; this
    * split exists so plan-shape tests can inspect the iteration plan
    * before checkpointing truncates it to a LogicalRDD scan).
    */
  private[graft] def pagerankPlan(pairs: DataFrame, iterations: Int,
      scale: Long): (DataFrame, EdgeIndex) = {
    checkIterScale(iterations, scale)
    val ix = buildIndex(pairs)
    try {
      // int64 bound: total mass stays ≤ n·scale under damping (0.15
      // base + 0.85 redistribution of a conserved-or-shrinking total),
      // so the largest value r·17 can reach is 17·n·scale. Fail
      // loudly, never wrap (Spark non-ANSI) while the oracle raises.
      require(BigInt(DampNum) * ix.nNodes * scale <= Long.MaxValue,
        s"pagerank int64 bound exceeded (nodes=${ix.nNodes}, " +
          s"scale=$scale): lower scale — rank resolution degrades " +
          "gracefully")

      val base = (3L * scale) / DampDen
      // r(id): every node with an edge (undirected ⇒ outdeg ≥ 1 and
      // indeg ≥ 1, so the per-dst inbound sum below covers all of them
      // and needs no node-frame left join, unlike the seeded variant)
      var r = ix.nodes.select(col("id"), lit(scale).as("r"))
      for (_ <- 1 to iterations)
        r = inbound(ix, r).select(col("id"), (lit(base) + col("s")).as("r"))
      val out = r.join(ix.nodes, "id")
        .select(col("id").as("doc_id"), col("outdeg"),
          col("r").as("pr_scaled"),
          round(col("r").cast("double") / lit(scale).cast("double"), 6)
            .as("pr"))
      (out, ix)
    } catch { case e: Throwable => ix.release(); throw e }
  }
}
