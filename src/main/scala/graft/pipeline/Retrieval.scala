package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse keyword retrieval over the corpus — the BM25 ranking a
  * training-data pipeline needs for decontamination probes, seed-query
  * curation, and retrieval-augmented filtering (find the corpus
  * documents most relevant to a benchmark prompt before deciding to
  * drop or keep them).
  *
  * Scoring is Robertson/Spärck-Jones BM25 (k1 = 1.2, b = 0.75) with
  * one deliberate twist: the idf factor is kept RATIONAL —
  * `(N − df + ½)/(df + ½)` — instead of wrapped in the usual `ln`.
  * Per term the two are monotone-equivalent, and the rational form
  * makes every score deterministic double algebra over exact int64s:
  * each term's contribution is the PRODUCT of two exact int64
  * quotients (idf × tf-part), each correctly rounded by IEEE
  * division, multiplied once (one more correctly-rounded op — still
  * bit-identical on every engine), and the cross-term sum is folded
  * in FIXED term-index order. The ranking is therefore
  * bit-deterministic and replayable by the SQL oracle — no libm `ln`
  * (whose last-ulp behavior is engine-specific) anywhere near a sort
  * key. The two-factor form (ADVICE r12) keeps every integer
  * intermediate within int64 up to `22·dl_max·total < 2^63` —
  * ~4·10^17 token-length-weighted mass, i.e. petabyte-scale corpora —
  * where the old single-ratio form overflowed at `N·tf·total ≳
  * 4·10^17`; the bound is ENFORCED driver-side (BigInt check against
  * the corpus stats — a corpus past it fails loudly instead of
  * silently wrapping while the oracle raises). A deployment that
  * wants textbook log-idf can wrap the factor at the end of the
  * pipeline; the plan shape is identical.
  *
  * Scale: the query table is a literal (broadcast by construction);
  * corpus statistics (N, Σdl) are one tiny aggregate; tf extraction is
  * a scan-speed projection per query term (the explode is filtered to
  * the ≤ `MaxTerms`·queries term set BEFORE the shuffle, so the
  * exploded frame carries only matching postings — the inverted-index
  * slice, not the corpus); ranking is a per-query top-k window that
  * plans as WindowGroupLimit (partial top-k before the shuffle). One
  * corpus scan for stats, one for postings — no join ever carries the
  * corpus on both sides.
  */
object Retrieval {

  /** Max terms per query — contributions are folded as fixed columns
    * c0 + c1 + … + c{MaxTerms-1}, which is what pins the float-sum
    * association order. 8 covers real decontamination probes
    * (benchmark prompts run longer than curation keywords); the fold
    * generalizes to any width — widen the constant, the oracle's fold
    * is generated from it. */
  val MaxTerms = 8

  /** BM25 top-k per query. `queries` = (query_id, terms); terms beyond
    * [[MaxTerms]] are rejected (widen the constant, not the call).
    * Returns (query_id, rank, doc_id, n_terms_matched, score).
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, Seq[String])], k: Int,
               textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(queries.nonEmpty, "empty query set")
    require(queries.forall(_._2.nonEmpty), "query with no terms")
    require(queries.forall(_._2.size <= MaxTerms),
      s"query exceeds MaxTerms=$MaxTerms")
    val s = docs.sparkSession
    import s.implicits._

    // corpus stats: N docs, total tokens (Σdl) — one tiny aggregate,
    // collected once and inlined as literals (broadcast-by-literal)
    val dl = size(split(col(textCol), " ")).cast("long")
    val statsRow = docs.agg(
      count(lit(1)).cast("long").as("n"),
      sum(dl).as("total"),
      max(dl).as("dl_max")).head()
    val n = statsRow.getLong(0)
    val total = statsRow.getLong(1)
    val dlMax = statsRow.getLong(2)
    require(n > 0, "empty corpus")
    // int64-overflow guard (ADVICE r12): the largest integer any
    // contribution can form is bounded by tf ≤ dl ≤ dl_max and
    // df ≤ N. Checked in BigInt — past the bound we fail loudly
    // rather than wrap (Spark non-ANSI) while the oracle raises.
    val worst = Seq(
      BigInt(22) * dlMax * total,                               // tf num
      BigInt(10) * dlMax * total + BigInt(3) * total
        + BigInt(9) * dlMax * n,                                // tf den
      BigInt(2) * n + 1)                                        // idf num
    require(worst.forall(_ <= Long.MaxValue),
      s"bm25 int64 bound exceeded (dl_max=$dlMax, total=$total, n=$n): " +
        "shard the corpus or switch the tf factor to the normalized form")

    // the literal query-term table: (query_id, ti, term)
    val terms = queries.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i.toLong, t) }
    }.toDF("query_id", "ti", "term")
    val termSet = queries.flatMap(_._2).distinct

    // postings: (doc_id, term, tf, dl) — explode filtered to the query
    // vocabulary BEFORE any shuffle, so only matching tokens survive
    // the scan (the inverted-index slice)
    val postings = docs
      .select(col("doc_id"), dl.as("dl"),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term").isin(termSet: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("long").as("tf"), first(col("dl")).as("dl"))

    // document frequency per term (over the postings slice — a term's
    // df is the number of docs it appears in)
    val dfreq = postings.groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"))

    // exact-rational per-term contribution, as TWO separately-rounded
    // int64 quotients multiplied (never one cross-product — the
    // single-ratio form's numerator carried an extra ×2N and
    // overflowed at N·tf·total ≳ 4e17):
    //   idf      = (2N − 2df + 1) / (2df + 1)
    //   tf-part  = 22·tf·total / (10·tf·total + 3·total + 9·dl·N)
    // (k1 = 1.2, b = 0.75, avgdl = total/N multiplied through; every
    // intermediate is guarded ≤ int64 above)
    val idf = (lit(2L) * n - lit(2L) * col("df") + lit(1L)).cast("double") /
      (lit(2L) * col("df") + lit(1L)).cast("double")
    val tfPart = (lit(22L) * col("tf") * total).cast("double") /
      (lit(10L) * col("tf") * total + lit(3L) * total +
        lit(9L) * col("dl") * n).cast("double")
    val contrib = postings.join(dfreq, "term")
      .join(broadcast(terms), "term")
      .withColumn("c", idf * tfPart)

    // fixed-order fold: per (query, doc) the term at index i lands in
    // column c_i; score = ((c_0 + c_1) + c_2) + … — one association,
    // both engines
    val cCols = (0 until MaxTerms).map(i =>
      max(when(col("ti") === i.toLong, col("c"))).as(s"c$i"))
    val aggCols = count(lit(1)).cast("long").as("n_terms_matched") +: cCols
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("score",
        (0 until MaxTerms).map(i => coalesce(col(s"c$i"), lit(0.0)))
          .reduce(_ + _))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_terms_matched"), round(col("score"), 6).as("score"))
  }

  /** Reciprocal-rank fusion of two per-query rank lists — the hybrid
    * retrieval a curation pipeline runs when neither keyword (BM25)
    * nor embedding (ANN) ranking alone is trustworthy: decontamination
    * probes want the union of "shares rare tokens with the benchmark"
    * and "is semantically close to the benchmark", and RRF is the
    * standard score-free way to fuse them (Cormack et al., SIGIR'09:
    * rank positions only, so the two systems' incomparable score
    * scales never meet).
    *
    * Inputs are (query_id, doc_id, rank) frames — rank 1-based within
    * each query. The fused score is
    *
    *   rrf(q, d) = 1/(c + rank_a(q, d)) + 1/(c + rank_b(q, d))
    *
    * with a missing side contributing 0. Determinism: each reciprocal
    * is ONE correctly-rounded IEEE division of exact small integers and
    * the sum is two doubles in fixed (a + b) order, so the ranking —
    * ties broken by doc_id — is bit-identical on any engine; the output
    * carries the unrounded-ranked score rounded to 6 for display and
    * the per-side ranks (0 = absent from that side's list, ranks being
    * 1-based) so every row shows its own provenance.
    *
    * Scale: both inputs are per-query top-k lists — |queries|·k rows,
    * broadcast-sized by construction no matter how large the corpus
    * the upstream rankers scanned — so the fusion is a full-outer join
    * of two tiny frames plus one per-query top-k window. All the
    * 100 TB cost lives upstream in the rankers (BM25's single postings
    * scan, the ANN index's bounded per-list serve); fusing their
    * outputs is free by comparison.
    *
    * CALL-SITE HAZARD (ADVICE r17 #4): the rank-contract filter below
    * SILENTLY drops rank ≤ 0 rows — correct for this operator's own
    * fused output fed back in (rank 0 = absent by encoding), but a
    * caller that accidentally supplies a 0-BASED rank column loses
    * exactly its top-ranked doc per query with no error. Rankers
    * feeding this must emit 1-based ranks (every in-repo producer —
    * bm25TopK, the ANN serve paths — does; the spec locks the drop
    * semantics so the hazard at least stays documented-true).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Long = 60L)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(c >= 1L, s"rrf constant must be >= 1: $c")
    def side(df: DataFrame, as: String) = df.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      col("rank").cast("long").as(as))
      // enforce the documented 1-based contract (ADVICE r16): this
      // operator's own output encodes "absent from this side" as rank
      // 0, so a fused frame fed back in — or any 0/negative rank —
      // must read as ABSENT (contribute 0), not as 1/(c+0) mass or a
      // sign-flipped blowup at rank ≤ −c
      .where(col(as) >= 1L)
    val fused = side(a, "r_a").join(side(b, "r_b"),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("r_a")).cast("double"), lit(0.0))
          + coalesce(lit(1.0) / (lit(c) + col("r_b")).cast("double"),
            lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        coalesce(col("r_a"), lit(0L)).as("r_sparse"),
        coalesce(col("r_b"), lit(0L)).as("r_dense"),
        round(col("rrf"), 6).as("rrf"))
  }
}
