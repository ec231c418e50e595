package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed exact cases for the graph-centrality and hybrid
  * retrieval operators (pl_g1 / pl_r2), plus their plan-shape claims.
  */
class GraphRetrievalSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("pagerank: hand-computed 3-iteration path graph, exact int64") {
    // path 1 — 2 — 3; outdeg 1/2/1; scale 1e6, base = 150000.
    // iter1: r = (575000, 1850000, 575000)
    // iter2: r = (936250, 1127500, 936250)   (floor at 488750, 786250)
    // iter3: r = (629187, 1741624, 629187)   (floors of x.5 quotients)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val r = Graph.pagerankScaled(pairs, 3, 1000000L)
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("outdeg")).toSeq == Seq(1L, 2L, 1L))
    assert(r.map(_.getAs[Long]("pr_scaled")).toSeq ==
      Seq(629187L, 1741624L, 629187L))
    assert(r.map(_.getAs[Double]("pr")).toSeq ==
      Seq(0.629187, 1.741624, 0.629187))
  }

  test("pagerank: damping conserves bounded mass on a clique") {
    // 4-clique: perfectly symmetric, so every node must hold exactly
    // base + 3 · (r·17 div (20·3)) and all four ranks stay equal;
    // the fixed point of the int recurrence from r=scale.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("doc1", "doc2")
    val r = Graph.pagerankScaled(pairs, 5, 1000000L).collect()
    assert(r.length == 4)
    assert(r.map(_.getAs[Long]("pr_scaled")).distinct.length == 1)
    val v = r.head.getAs[Long]("pr_scaled")
    // symmetric fixed point ≈ scale; 5 rounds of floor loss only ever
    // shave single units (3 floors per round)
    assert(v <= 1000000L && v > 999900L, s"clique rank drifted: $v")
  }

  test("personalized pagerank: hand-computed seeded path, exact int64") {
    // path 1 — 2 — 3 (outdeg 1/2/1), seed {1}, scale 1e6, base 150000:
    // r1 = (150000, 850000, 0)
    // r2 = (511250, 127500, 361250)
    // r3(1) = 150000 + (127500·17) div 40           = 204187
    // r3(2) = (511250·17) div 20 + (361250·17) div 20 = 434562 + 307062
    // r3(3) = (127500·17) div 40                    = 54187
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val seeds = Seq(1L).toDF("doc_id")
    val r = Graph.personalizedPagerank(pairs, seeds, 3, 1000000L)
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("pr_scaled")).toSeq ==
      Seq(204187L, 741624L, 54187L))
    assert(r.map(_.getAs[Boolean]("is_seed")).toSeq ==
      Seq(true, false, false))
  }

  test("personalized pagerank: nodes unreachable from seeds hold " +
      "integer zero") {
    // two components 1—2 and 3—4; seed {1}: component {3,4} gets 0
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc1", "doc2")
    val seeds = Seq(1L).toDF("doc_id")
    val r = Graph.personalizedPagerank(pairs, seeds, 3, 1000000L)
      .orderBy("doc_id").collect()
    assert(r.length == 4)
    assert(r.filter(_.getAs[Long]("doc_id") >= 3L)
      .forall(_.getAs[Long]("pr_scaled") == 0L))
    assert(r.filter(_.getAs[Long]("doc_id") <= 2L)
      .forall(_.getAs[Long]("pr_scaled") > 0L))
  }

  test("pagerank: int64 overflow guard fails loudly") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val e = intercept[IllegalArgumentException] {
      Graph.pagerankScaled(pairs, 1, Long.MaxValue / 20L)
    }
    assert(e.getMessage.contains("int64 bound"))
  }

  test("rrfFuse: hand-computed fusion, missing sides contribute zero") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val r = Retrieval.rrfFuse(a, b, 3).orderBy("rank").collect()
    // doc20: 1/62 + 1/61 wins; doc10: 1/61; doc30: 1/62
    assert(r.map(x => (x.getAs[Long]("rank"), x.getAs[Long]("doc_id"))).toSeq
      == Seq((1L, 20L), (2L, 10L), (3L, 30L)))
    assert(r.map(x => (x.getAs[Long]("r_sparse"), x.getAs[Long]("r_dense")))
      .toSeq == Seq((2L, 1L), (1L, 0L), (0L, 2L)))
    val exp20 = BigDecimal(1.0 / 62.0 + 1.0 / 61.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getAs[Double]("rrf") == exp20)
  }

  test("rrfFuse: rank-0 'absent' encodings read as absent, so a fused " +
      "output fed back in adds no phantom mass") {
    // doc 20 carries this operator's own absent-encoding (rank 0) on
    // side a — it must contribute nothing there, not 1/(60+0)
    val a = Seq((1L, 10L, 1L), (1L, 20L, 0L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L)).toDF("query_id", "doc_id", "rank")
    val r = Retrieval.rrfFuse(a, b, 3).orderBy("rank").collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("r_sparse"),
      x.getAs[Long]("r_dense"))).toSeq ==
      Seq((10L, 1L, 0L), (20L, 0L, 1L)))
    // both at 1/61: the tie broke by doc_id and neither got 0-rank mass
    assert(r(0).getAs[Double]("rrf") == r(1).getAs[Double]("rrf"))
  }

  test("rrfFuse: equal scores tie-break by doc_id ascending") {
    val a = Seq((1L, 5L, 3L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 4L, 3L)).toDF("query_id", "doc_id", "rank")
    val r = Retrieval.rrfFuse(a, b, 2).orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(4L, 5L))
  }

  test("pagerank plan: zero corpus scans — iterations ride the " +
      "materialized edge index only") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.nearDupPairs(docs)
    val (plan, ix) = Graph.pagerankPlan(
      pairs.select("doc1", "doc2"), 3, 1000000000L)
    try {
      val p = plan.queryExecution.executedPlan.toString()
      assert(!p.contains("FileScan"),
        s"pagerank iterations must not re-scan the corpus:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "pagerank plans an all-pairs join")
      // the degree aggregation (`count(1)` over the edge list) must
      // live in the materialized index, NOT replay inside the
      // iteration lineage (r16 VERDICT #6) — non-vacuity: the same
      // signature IS present in the index build plan below
      assert(!p.contains("count(1)"),
        s"degree aggregation replays inside the iterations:\n$p")
      val buildPlan = pairs.select(col("doc1").cast("long").as("src"),
          col("doc2").cast("long").as("dst"))
        .groupBy("src").agg(count(lit(1)).as("outdeg"))
        .queryExecution.executedPlan.toString()
      assert(buildPlan.contains("count(1)"),
        "non-vacuity probe broken: count(1) signature not in a plain " +
          "degree aggregation plan")
    } finally { ix.release(); Caches.release(pairs) }
  }

  test("ppr on a prebuilt index: serve calls with revised seed sets " +
      "match the one-shot operator exactly") {
    // the st17 serve contract: build once, re-score per seed revision;
    // the final revision must equal personalizedPagerank on the same
    // full seed set, bit for bit
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc1", "doc2")
    val ix = Graph.buildIndex(pairs)
    try {
      val partial = Graph.pprOnIndex(ix, Seq(1L).toDF("doc_id"), 3, 1000000L)
      val full = Graph.pprOnIndex(ix, Seq(1L, 4L).toDF("doc_id"), 3, 1000000L)
      try {
        val oneShot = Graph.personalizedPagerank(pairs,
          Seq(1L, 4L).toDF("doc_id"), 3, 1000000L)
        try {
          assert(full.orderBy("doc_id").collect().toSeq ==
            oneShot.orderBy("doc_id").collect().toSeq)
          // the partial revision is a genuinely different scoring (the
          // re-score per batch is not a no-op)
          assert(partial.filter(col("doc_id") === 4L)
            .head().getAs[Long]("pr_scaled") <
            full.filter(col("doc_id") === 4L)
              .head().getAs[Long]("pr_scaled"))
        } finally Caches.release(oneShot)
      } finally { Caches.release(partial); Caches.release(full) }
    } finally ix.release()
  }

  test("incremental ppr: delta composition equals the one-shot operator " +
      "bit for bit, batch by batch") {
    // the st18 serve contract. Graph chosen dense + asymmetric and the
    // scale ODD so the floor divisions are ragged: a naive "PPR(new
    // seeds alone) + standing scores" composition — which floor makes
    // WRONG (floor((a+b)x) != floor(ax)+floor(bx)) — fails this test;
    // the exact per-edge floor-difference propagation passes it.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L))
      .toDF("doc1", "doc2")
    val ix = Graph.buildIndex(pairs)
    try {
      var st = Graph.pprInit(ix, 3, 1000003L)
      // batch 1: seed {1} — delta from the empty state IS the full
      // recurrence, so this also gates the from-zero path
      val st1 = Graph.pprAddSeeds(ix, st, Seq(1L).toDF("doc_id"))
      st.release(); st = st1
      val oneShot1 = Graph.pprOnIndex(ix, Seq(1L).toDF("doc_id"),
        3, 1000003L)
      try assert(Graph.pprScores(st).orderBy("doc_id").collect().toSeq ==
        oneShot1.orderBy("doc_id").collect().toSeq)
      finally Caches.release(oneShot1)
      // batch 2: seed {3}, plus a duplicate of seed 1 (must be a
      // no-op) and a seed absent from the graph (must drop, same
      // membership rule as pprOnIndex)
      val st2 = Graph.pprAddSeeds(ix, st,
        Seq(3L, 1L, 99L).toDF("doc_id"))
      st.release(); st = st2
      val oneShot2 = Graph.pprOnIndex(ix, Seq(1L, 3L).toDF("doc_id"),
        3, 1000003L)
      try assert(Graph.pprScores(st).orderBy("doc_id").collect().toSeq ==
        oneShot2.orderBy("doc_id").collect().toSeq)
      finally Caches.release(oneShot2)
      st.release()
    } finally ix.release()
  }

  test("incremental ppr: a batch of already-seen / off-graph seeds " +
      "leaves the standing scores bit-identical") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val ix = Graph.buildIndex(pairs)
    try {
      val st0 = Graph.pprInit(ix, 3, 1000000L)
      val st1 = Graph.pprAddSeeds(ix, st0, Seq(2L).toDF("doc_id"))
      st0.release()
      val before = Graph.pprScores(st1).orderBy("doc_id").collect().toSeq
      val st2 = Graph.pprAddSeeds(ix, st1,
        Seq(2L, 77L).toDF("doc_id"))
      st1.release()
      try assert(
        Graph.pprScores(st2).orderBy("doc_id").collect().toSeq == before)
      finally st2.release()
    } finally ix.release()
  }

  test("canonicalByCentrality: per-cluster argmax by rank, ties to min " +
      "doc_id, labels cover exactly the clustered docs") {
    // cluster A = path 5—6—7 (center 6 holds the rank max); cluster
    // B = pair 10—11 (symmetric ranks TIE — canonical must be 10)
    val pairs = Seq((5L, 6L), (6L, 7L), (10L, 11L))
      .map { case (a, b) => (a, b, 1.0) }
      .toDF("doc1", "doc2", "jaccard")
    val r = CorpusFilter.canonicalByCentrality(pairs)
    try {
      val rows = r.orderBy("doc_id").collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSeq ==
        Seq(5L, 6L, 7L, 10L, 11L))
      assert(rows.map(_.getAs[Long]("canonical_id")).toSeq ==
        Seq(6L, 6L, 6L, 10L, 10L))
      assert(rows.map(_.getAs[Long]("cluster_size")).toSeq ==
        Seq(3L, 3L, 3L, 2L, 2L))
      assert(rows.map(_.getAs[Boolean]("is_canonical")).count(identity) == 2)
      // exactly one canonical per cluster, and it is a cluster member
      assert(rows.groupBy(_.getAs[Long]("cluster_rep")).forall {
        case (_, members) =>
          val canon = members.map(_.getAs[Long]("canonical_id")).distinct
          canon.length == 1 &&
            members.exists(_.getAs[Long]("doc_id") == canon.head)
      })
    } finally Caches.release(r)
  }
}
