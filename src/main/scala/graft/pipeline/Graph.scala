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
    // error path releases whatever was materialized before rethrowing
    // (ADVICE r17 #3: a failure between the nodes and degEdges
    // materializations previously leaked the nodes checkpoint)
    var nodes: DataFrame = null
    var degEdges: DataFrame = null
    try {
      nodes = Caches.materialize(
        edges.groupBy("src")
          .agg(count(lit(1)).cast("long").as("outdeg"))
          .select(col("src").as("id"), col("outdeg")))
      degEdges = Caches.materialize(
        edges.join(nodes.select(col("id").as("src"), col("outdeg")),
          "src"))
      EdgeIndex(degEdges, nodes, nodes.count())
    } catch { case e: Throwable =>
      Option(nodes).foreach(Caches.release)
      Option(degEdges).foreach(Caches.release)
      throw e
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

  /** The standing state of an INCREMENTAL personalized-PageRank serve
    * (the st18 streaming twin's cross-batch state): one MATERIALIZED
    * node-sized frame carrying, per node, `outdeg`, the accumulated
    * seed flag, and the rank value of EVERY iteration layer
    * (`r0 … r<iterations>`) — not just the final scores. The full
    * trajectory is what makes delta re-scoring EXACT: iteration t of
    * the floor-divided recurrence reads r_{t-1}, so composing a new
    * seed batch onto standing scores needs the old r_{t-1}(u) at every
    * frontier node, per layer (the final-scores-only shortcut would
    * have to re-derive them from scratch — the full re-score st17
    * performs).
    */
  final case class PprState(layers: DataFrame, iterations: Int,
      scale: Long, nSeeds: Long = 0L) {
    def release(): Unit = Caches.release(layers)
  }

  /** Empty [[PprState]] over an index: no seeds, every layer integer 0
    * (the PPR of the empty seed set). Node-sized, materialized.
    */
  def pprInit(ix: EdgeIndex, iterations: Int = 3,
      scale: Long = 1000000000L): PprState = {
    checkIterScale(iterations, scale)
    val zeros = (0 to iterations).map(t => lit(0L).as(s"r$t"))
    PprState(Caches.materialize(
      ix.nodes.select(col("id") +: col("outdeg") +:
        lit(false).as("is_seed") +: zeros: _*)), iterations, scale)
  }

  /** Fold a NEW seed batch into the standing state by DELTA
    * propagation — bit-exact equal to re-running [[pprOnIndex]] on the
    * accumulated seed set, at the cost of the delta-REACHABLE frontier
    * only (st17's per-batch full re-score touches every edge every
    * iteration; this touches edges leaving nodes whose rank actually
    * changed).
    *
    * Exactness argument (the floor division makes naive linearity
    * FALSE — floor((a+b)/d) ≠ floor(a/d) + floor(b/d) — so the delta
    * is NOT "run PPR on the new seeds alone and add"): per layer t and
    * edge u→v the update carries the exact difference
    *
    *   Δcontrib(u→v) = ((r+Δ)·17) div (20·outdeg) − (r·17) div (20·outdeg)
    *
    * with r = the standing r_{t-1}(u) and Δ = the layer-(t-1) delta at
    * u, so the new per-edge term is reconstructed exactly, not
    * approximated; the per-node combine is an int64 SUM of those
    * differences plus the base-teleport delta `base·[v ∈ newSeeds]`.
    * By induction r_t(new) = r_t(old) + Δ_t per node, layer by layer —
    * the identity GraphRetrievalSpec locks against the one-shot
    * operator. All deltas are ≥ 0 (seeds only add mass and the floor
    * difference of a monotone step is ≥ 0), so `div` (truncation) and
    * the oracle's `//` (floor) agree, as everywhere in this family.
    *
    * Seeds not present in the node set drop (same membership rule as
    * [[pprOnIndex]]); seeds already folded in are ignored (their delta
    * is zero by construction). Returns the NEW materialized state; the
    * caller releases the old one (foreachBatch does exactly that).
    */
  def pprAddSeeds(ix: EdgeIndex, st: PprState,
      newSeeds: DataFrame): PprState = {
    val scale = st.scale
    val base = (3L * scale) / DampDen
    val seedIds = newSeeds.select(col("doc_id").cast("long").as("id"))
      .distinct()
    // frontier 0: genuinely-new seeds that exist in the graph
    val delta0 = Caches.materialize(
      st.layers.join(seedIds, "id").filter(!col("is_seed"))
        .select(col("id"), lit(scale).as("d")))
    val deltas = scala.collection.mutable.ArrayBuffer[DataFrame](delta0)
    try {
      // r18: the standing seed count rides the state (pprInit starts it
      // at 0, every fold adds its genuinely-new count) instead of a
      // full layers re-scan per batch — the count is definitionally
      // equal to the is_seed population (flags are set only here).
      val nSeeds = st.nSeeds + delta0.count()
      require(
        BigInt(DampNum) * math.max(nSeeds, 1L) * scale <= Long.MaxValue,
        s"ppr int64 bound exceeded (seeds=$nSeeds, scale=$scale): " +
          "lower scale — rank resolution degrades gracefully")
      for (t <- 1 to st.iterations) {
        val prev = deltas(t - 1)
        // frontier rows with the OLD layer-(t-1) value at each node
        val f = prev.join(
          st.layers.select(col("id"), col(s"r${t - 1}").as("rprev")), "id")
        val inboundDiff = ix.degEdges
          .join(f, col("id") === col("src"))
          .select(col("dst"), expr(
            s"((rprev + d) * $DampNum) div (${DampDen}L * outdeg)" +
              s" - (rprev * $DampNum) div (${DampDen}L * outdeg)")
            .as("cd"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("cd")).as("s"))
        deltas += Caches.materialize(
          delta0.select(col("id"), lit(base).as("b"))
            .join(inboundDiff, Seq("id"), "full_outer")
            .select(col("id"),
              (coalesce(col("b"), lit(0L)) + coalesce(col("s"), lit(0L)))
                .as("d"))
            .filter(col("d") =!= 0L))
      }
      // fold every layer's delta into the standing frame in ONE pass
      var merged = st.layers
      for (t <- 0 to st.iterations)
        merged = merged.join(
          deltas(t).select(col("id"), col("d").as(s"_d$t")), Seq("id"), "left")
      val rCols = (0 to st.iterations).map(t =>
        (col(s"r$t") + coalesce(col(s"_d$t"), lit(0L))).as(s"r$t"))
      val newLayers = Caches.materialize(merged.select(
        col("id") +: col("outdeg") +:
          (col("is_seed") || col("_d0").isNotNull).as("is_seed") +:
          rCols: _*))
      PprState(newLayers, st.iterations, scale, nSeeds)
    } finally deltas.foreach(Caches.release)
  }

  /** The standing scores in [[pprOnIndex]]'s exact output shape
    * (doc_id, outdeg, is_seed, pr_scaled, pr) — a LAZY projection over
    * the state's materialized layers (materialize it before releasing
    * the state).
    */
  def pprScores(st: PprState): DataFrame =
    st.layers.select(col("id").as("doc_id"), col("outdeg"),
      col("is_seed"), col(s"r${st.iterations}").as("pr_scaled"),
      round(col(s"r${st.iterations}").cast("double")
        / lit(st.scale).cast("double"), 6).as("pr"))

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
