package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching (KMV / k-minimum-values,
  * Bar-Yossef et al. 2002): keep the k smallest values of a uniform
  * hash over the domain; with R = kth-min / hash-range the estimator
  * (k-1)/R is unbiased. Unlike HLL, KMV over a FIXED hash (md5-derived
  * 60-bit, [[TextOps.hash60]]) is bit-deterministic on any engine, so
  * the estimate itself is oracle-checkable — the sketch the engine
  * would run at 100 TB where exact `count(distinct)` is a full-corpus
  * shuffle it can't afford.
  *
  * Scale: dedup of hashes is a map-side-combined aggregation; the
  * k-minimum pass is `orderBy(h).limit(k)` — TakeOrderedAndProject,
  * a per-partition top-k tree-reduced on the driver, never a global
  * sort. At production scale the exact count is simply dropped
  * (`withExact = false`); it is computed here so the entry can show
  * estimate-vs-truth in one row.
  */
object Sketches {

  /** One-row frame: `n_exact` (exact distinct hashes), `kth_hash`,
    * `k_eff` (= min(k, n_exact)), and `kmv_est` — the KMV estimate
    * floor((k_eff-1) * 2^60 / kth_hash + 0.5), computed in identical
    * IEEE double steps on any engine ((k-1)*2^60 is exact in double
    * for k ≤ 2^53 / 2^60-scale; one division; one round).
    */
  def kmvDistinct(df: DataFrame, hash: Column, k: Int,
                  withExact: Boolean = true): DataFrame = {
    val hPlan = df.select(hash.as("h")).distinct()
    def estOf(h: DataFrame) = h.orderBy("h").limit(k)
      .agg(max(col("h")).as("kth_hash"),
        count(lit(1)).cast("long").as("k_eff"))
      .withColumn("kmv_est",
        round((col("k_eff") - 1).cast("double") * lit(math.pow(2, 60)) /
          col("kth_hash").cast("double")).cast("long"))
    if (!withExact) {
      // production path: ONE action, nothing persisted — a persist here
      // would cache one row per distinct value (possibly TBs at 100 TB
      // corpus scale) for no reuse at all
      estOf(hPlan)
    } else {
      // demo path (estimate vs truth in one row): the distinct-hash
      // frame feeds TWO actions (top-k and exact count), so the persist
      // buys the second scan — bounded by distinct cardinality, and
      // released before return. Drop withExact at scale instead.
      val h = hPlan.persist()
      try {
        val out = h.agg(count(lit(1)).cast("long").as("n_exact"))
          .crossJoin(estOf(h))
        // the sketch is one row — materialize so unpersist is safe
        val rows = out.collect()
        df.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), out.schema)
      } finally h.unpersist()
    }
  }

  /** KMV set-similarity between TWO item streams (Beyer et al. 2007's
    * multi-set KMV synopses, the k-min union trick): the k smallest
    * distinct hashes of A ∪ B form a uniform sample of the union, so
    * the fraction of them present in BOTH sides estimates
    * Jaccard(A, B) — `jaccard_est = |union_k ∩ A ∩ B| / k_eff`. This
    * is the corpus-OVERLAP probe a pipeline runs before merging two
    * crawls (what fraction of vocabulary/shingles is shared?) at
    * sketch cost instead of a distinct-join over both corpora.
    * Same determinism contract as [[kmvDistinct]]: the md5-derived
    * hash makes sketch AND estimate bit-reproducible on any engine;
    * the exact intersection/union counts ride along for the
    * estimate-vs-truth row and are dropped at production scale
    * (`withExact = false`).
    *
    * Returns one row: (k_eff, n_both_k, jaccard_est[, n_inter_exact,
    * n_union_exact, jaccard_exact]).
    *
    * Scale: each side dedups its hashes map-side-combined; the merged
    * per-hash membership frame is aggregated once (max per flag), the
    * k-minimum pass is orderBy+limit = TakeOrderedAndProject. Nothing
    * global beyond k rows on the driver; at 100 TB run each side's
    * dedup at its own partitioning and the union frame is bounded by
    * distinct cardinality, not corpus size.
    */
  def kmvJaccard(dfA: DataFrame, dfB: DataFrame, hash: Column, k: Int,
                 withExact: Boolean = true): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val ha = dfA.select(hash.as("h")).distinct()
      .withColumn("in_a", lit(1)).withColumn("in_b", lit(0))
    val hb = dfB.select(hash.as("h")).distinct()
      .withColumn("in_a", lit(0)).withColumn("in_b", lit(1))
    val merged = ha.unionAll(hb)
      .groupBy("h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    def estOf(m: DataFrame) = m.orderBy("h").limit(k)
      .agg(count(lit(1)).cast("long").as("k_eff"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_both_k"))
      .withColumn("jaccard_est",
        col("n_both_k").cast("double") / col("k_eff").cast("double"))
    if (!withExact) estOf(merged)
    else {
      // demo path (estimate vs truth): the merged membership frame
      // feeds two actions — persist, materialize the one-row result,
      // release (the kmvDistinct discipline)
      val m = merged.persist()
      try {
        val out = estOf(m).crossJoin(
          m.agg(
            sum(col("in_a") * col("in_b")).cast("long").as("n_inter_exact"),
            count(lit(1)).cast("long").as("n_union_exact"))
            .withColumn("jaccard_exact",
              col("n_inter_exact").cast("double") /
                col("n_union_exact").cast("double")))
        val rows = out.collect()
        dfA.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), out.schema)
      } finally m.unpersist()
    }
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over an item
    * stream, as a (seed, cell, cnt) TABLE: row `seed` of the d×w count
    * matrix, cell = hash60("cms{seed}|" + item) mod w. Like KMV the
    * hash family is md5-derived, so the sketch — and every estimate
    * read from it — is bit-deterministic on any engine.
    *
    * Scale: building the sketch is ONE aggregation keyed by
    * (seed, cell) with map-side combine, so each task contributes at
    * most d·w partial rows regardless of input size, and the global
    * sketch is ≤ d·w rows total. groupBy-count IS the CMS merge
    * (cell-wise addition), so shards/streams combine for free.
    */
  /** The d (seed, cell) pairs of one item — the ONE definition of the
    * CMS hash derivation; build and probe read the same cells or the
    * estimates silently go wrong.
    */
  private def cmsCells(item: Column, d: Int, w: Int): Column =
    array((0 until d).map(s =>
      struct(lit(s).as("seed"),
        pmod(TextOps.hash60(concat(lit(s"cms$s|"), item)),
          lit(w.toLong)).as("cell"))): _*)

  def cmsSketch(items: DataFrame, item: Column,
                d: Int = 3, w: Int = 1024): DataFrame =
    items.select(item.as("_it"))
      .select(explode(cmsCells(col("_it"), d, w)).as("sc"))
      .groupBy(col("sc.seed").as("seed"), col("sc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Heavy hitters via the CMS: estimate every candidate item's
    * frequency as min over the d rows of its cell counts (the classic
    * one-sided estimate: est ≥ truth always) and return the top
    * `topK` by (estimate desc, item asc).
    *
    * Here the candidate set is the full distinct-item frame so the
    * entry can carry the exact count alongside the estimate
    * (estimate-vs-truth in every row, like [[kmvDistinct]]); at
    * production scale candidates come from a sampled or per-partition
    * top-k pre-pass and the exact column is dropped. The
    * sketch-side join carries no hint — a ≤ d·w-row frame measures
    * broadcast-small under AQE without being forced. The top-k is
    * orderBy+limit: TakeOrderedAndProject, never a global sort.
    */
  def cmsHeavyHitters(items: DataFrame, item: Column, topK: Int = 20,
                      d: Int = 3, w: Int = 1024): DataFrame = {
    val sk = cmsSketch(items, item, d, w)
    val cand = items.select(item.as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact"))
    cand
      .select(col("tok"), col("exact"),
        explode(cmsCells(col("tok"), d, w)).as("sc"))
      .select(col("tok"), col("exact"),
        col("sc.seed").as("seed"), col("sc.cell").as("cell"))
      .join(sk, Seq("seed", "cell"))
      .groupBy("tok", "exact")
      .agg(min("cnt").as("cms_est"))
      .orderBy(col("cms_est").desc, col("tok").asc)
      .limit(topK)
      .select("tok", "cms_est", "exact")
  }

  /** HyperLogLog (Flajolet et al. 2007) register table: reg =
    * hash60 mod 2^p, and the register value is max over items of
    * rho = (61−p) − bitlen(hash60 div 2^p) (the 1-based position of
    * the leading 1-bit in the remaining 60−p hash bits; a zero
    * remainder reads the max, 61−p). Bit-exact on any engine: bitlen
    * is the LENGTH OF THE BINARY STRING (`conv(w,10,2)` here,
    * `printf('%b')` in DuckDB) — never floor(log2(double)), whose
    * rounding at powers of two is not portable. The div is a
    * right-shift: dividing after a BIGINT→DOUBLE cast would shear off
    * the low hash bits.
    *
    * Scale: one (reg)-keyed aggregation with map-side combine — each
    * task contributes ≤ 2^p partial rows regardless of input size, and
    * groupBy-max IS the HLL merge, so shards/streams combine for free
    * (same property the CMS build has).
    */
  /** The (register, rho) projection — the ONE definition of the HLL
    * hash split, shared by the global and grouped register builds.
    */
  private def hllRegRho(item: Column, p: Int): (Column, Column) = {
    val m = 1L << p
    val rhoMax = 61 - p
    val h = TextOps.hash60(concat(lit("hll|"), item))
    val w = shiftright(h, p)
    (h % m,
      when(w > 0, lit(rhoMax) - length(conv(w, 10, 2)))
        .otherwise(lit(rhoMax)).cast("int"))
  }

  def hllRegisters(items: DataFrame, item: Column, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of [4,16]: $p")
    val (reg, rho) = hllRegRho(item, p)
    items.select(reg.as("reg"), rho.as("rho"))
      .groupBy("reg").agg(max("rho").as("max_rho"))
  }

  /** One-row HLL summary: observed/zero register counts, the EXACT
    * integer harmonic numerator S = Σ 2^((61−p)−reg_value) (unobserved
    * registers count as value 0, contributing 2^(61−p) each; S ≤
    * 2^p·2^(61−p) = 2^61, always BIGINT-exact), the raw estimate
    * α·m²·2^(61−p) / S as ONE literal-over-cast IEEE division
    * (bit-identical on both engines — the constant is computed once in
    * Scala and interpolated into the oracle), and the exact distinct
    * count alongside, KMV style. No small-range linear-counting
    * branch: it needs ln(), which is libm-dependent — the raw
    * estimator + zero-register count give the caller everything the
    * correction needs.
    */
  def hllSummary(items: DataFrame, item: Column, p: Int = 8): DataFrame = {
    val m = 1L << p
    val rhoMax = 61 - p
    val regs = hllRegisters(items, item, p)
    val exact = items.select(item.as("_it")).agg(
      count_distinct(col("_it")).as("exact_distinct"))
    regs.agg(
        count(lit(1)).as("n_obs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rhoMax - max_rho)"))
          .as("_s_obs"))
      .select(col("n_obs"),
        (lit(m) - col("n_obs")).as("n_zero_registers"),
        (col("_s_obs") + (lit(m) - col("n_obs")) * (1L << rhoMax))
          .as("harmonic_s"))
      .withColumn("hll_raw_est",
        lit(Sketches.hllConst(p)) / col("harmonic_s").cast("double"))
      .crossJoin(exact)
  }

  /** Per-GROUP HLL distinct summary — the "distinct users per
    * day/source/type" query a 100 TB pipeline cannot answer with exact
    * `count(distinct)` per group (a full shuffle of every (group,
    * value) pair). Two bounded keyed aggregations: (group, reg) →
    * max rho — ≤ m partial rows PER GROUP per task via map-side
    * combine, and the groupBy-max IS the per-group sketch merge — then
    * group → the same exact-integer harmonic sum and single-division
    * raw estimate as [[hllSummary]]. State is groups × m registers,
    * never groups × distinct-values.
    */
  def hllGrouped(items: DataFrame, group: Column, item: Column,
                 p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of [4,16]: $p")
    val m = 1L << p
    val rhoMax = 61 - p
    val (reg, rho) = hllRegRho(item, p)
    items.select(group.as("grp"), reg.as("reg"), rho.as("rho"))
      .groupBy("grp", "reg").agg(max("rho").as("max_rho"))
      .groupBy("grp").agg(
        count(lit(1)).as("n_obs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rhoMax - max_rho)"))
          .as("_s_obs"))
      .select(col("grp"), col("n_obs"),
        (lit(m) - col("n_obs")).as("n_zero_registers"),
        (col("_s_obs") + (lit(m) - col("n_obs")) * (1L << rhoMax))
          .as("harmonic_s"))
      .withColumn("hll_raw_est",
        lit(Sketches.hllConst(p)) / col("harmonic_s").cast("double"))
  }

  /** α_m · m² · 2^(61−p) for the raw estimator — ONE Scala double
    * constant shared verbatim with the oracle SQL (interpolated), so
    * the estimate is a single identical IEEE division on both engines.
    */
  def hllConst(p: Int): Double = {
    val m = (1L << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * Math.pow(2.0, (61 - p).toDouble)
  }

  /** Bloom filter (Bloom 1970) as a bit-position TABLE: the ≤ m distinct
    * set positions `hash60("bf{seed}|" + key) mod m` over `d` seeds for
    * every member key. md5-derived like KMV/CMS, so the filter — and
    * every membership probe against it — is bit-deterministic on any
    * engine. Distributed build is one explode + distinct (a (bit)-keyed
    * shuffle bounded by m out); unions of filters and incremental adds
    * are just further distincts.
    */
  /** The d bit positions of one key — the ONE definition of the Bloom
    * hash derivation, shared by build and probe.
    */
  private def bloomPositions(key: Column, d: Int, m: Int): Column =
    array((0 until d).map(s =>
      pmod(TextOps.hash60(concat(lit(s"bf$s|"), key)), lit(m.toLong))): _*)

  def bloomBits(keys: DataFrame, key: Column,
                d: Int = 4, m: Int = 8192): DataFrame =
    keys.select(key.cast("string").as("_k"))
      .select(explode(bloomPositions(col("_k"), d, m)).as("bit"))
      .distinct()

  /** Probe the filter: for each distinct probe key, `bloom_hit` iff ALL
    * of its d positions are set (count of matched DISTINCT positions ==
    * count of its distinct positions — two seeds may collide into one
    * cell, so both sides count distinct).
    *
    * Scale: the probe side explodes to d rows per key and inner-joins
    * the ≤ m-row bit table — no hint; a few-KB bit table measures
    * broadcast-small under AQE without being forced. The left join back
    * preserves probes with zero matched bits. This is the shuffle-free
    * semi-join surrogate a 100 TB pipeline uses to pre-filter a fact
    * table against a small key set without shuffling the fact side: the
    * false-positive rate (1-e^(-dn/m))^d is the price of making the
    * filter a scan-local predicate.
    */
  def bloomProbe(probes: DataFrame, probeKey: Column, bits: DataFrame,
                 d: Int = 4, m: Int = 8192): DataFrame = {
    val p = probes.select(probeKey.cast("string").as("_k")).distinct()
      .withColumn("_pb", array_distinct(bloomPositions(col("_k"), d, m)))
    val matched = p
      .select(col("_k"), explode(col("_pb")).as("bit"))
      .join(bits, Seq("bit"))
      .groupBy("_k").agg(count(lit(1)).as("_nm"))
    p.join(matched, Seq("_k"), "left")
      .select(col("_k").as("probe_key"),
        (coalesce(col("_nm"), lit(0L)) === size(col("_pb"))).as("bloom_hit"))
  }

  /** Fixed-bin histogram — the distribution-profile member of the
    * sketch family, and the deterministic quantile substitute: bounded
    * (≤ nbins rows out), mergeable (groupBy-sum IS the merge, the
    * CMS/HLL contract — shards and streams combine for free), and
    * bit-deterministic (pure integer bin arithmetic, no sampling —
    * unlike GK/t-digest sketches whose state depends on arrival
    * order). Returns one row per NON-EMPTY bin: (bin, lo_edge,
    * hi_edge, cnt, cum_cnt), cum_cnt the running total in bin order —
    * quantile q reads off as the first bin with cum_cnt >= ceil(q·N),
    * with error bounded by the bin width. This is how a 100 TB
    * pipeline profiles a distribution (doc lengths, scores) without
    * the global sort an exact percentile costs.
    *
    * Scale: one bounded keyed aggregation with map-side combine
    * (≤ nbins partial rows per task), then a window over ≤ nbins rows
    * for the cumulative — the single-partition window is bounded by
    * nbins, never by data. Values below `lo` clamp into the first
    * bin, at/above `hi` into the last (explicit edge policy so the
    * bins partition the whole domain).
    */
  def histogram(df: DataFrame, value: Column,
                lo: Long, hi: Long, nbins: Int): DataFrame = {
    require(nbins >= 1 && hi > lo && (hi - lo) % nbins == 0,
      s"need hi > lo and nbins dividing the range, got [$lo,$hi)/$nbins")
    val width = (hi - lo) / nbins
    val bin = least(greatest(
      floor((value.cast("long") - lo) / width).cast("long"), lit(0L)),
      lit((nbins - 1).toLong))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("lo_edge"),
        (lit(lo) + (col("bin") + 1L) * width).as("hi_edge"),
        col("cnt"),
        sum("cnt").over(w).as("cum_cnt"))
  }

  /** Per-GROUP histogram + quantile read-off, fully distributed — the
    * "p50/p95 doc length per language" corpus-health metric at a scale
    * where per-group exact percentiles (a full sort per group) are off
    * the table. Same clamped integer binning as [[histogram]]; the
    * cumulative window and the quantile selection run over ≤ nbins
    * rows PER GROUP (bounded by the sketch, never the data), so
    * nothing here is driver-side and no group ever holds more than
    * nbins × |qs| rows past the first aggregation.
    *
    * Quantiles are RATIONALS (num, den): the rank target is
    * ceil(num·N/den) computed in pure integer arithmetic
    * ((num·N + den − 1) div den), so the read-off is bit-identical on
    * any engine — a double 0.9·N can straddle an integer boundary by
    * one ulp and flip ceil() between engines.
    *
    * Output: (grp, num, den, q_est) — q_est is the LOWER edge of the
    * smallest bin whose cumulative count reaches the target (the
    * [[histogramQuantiles]] policy, per group).
    *
    * Scale: one (grp, bin) keyed aggregation with map-side combine,
    * one grp-partitioned window over bounded rows, a ×|qs| literal
    * explode, and one bounded (grp, q) min — two keyed shuffles total.
    */
  def histogramGroupedQuantiles(df: DataFrame, group: Column, value: Column,
                                lo: Long, hi: Long, nbins: Int,
                                qs: Seq[(Int, Int)]): DataFrame = {
    require(nbins >= 1 && hi > lo && (hi - lo) % nbins == 0,
      s"need hi > lo and nbins dividing the range, got [$lo,$hi)/$nbins")
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 0 && n <= d && d > 0 },
      s"quantiles must be rationals in [0,1]: $qs")
    val width = (hi - lo) / nbins
    val bin = least(greatest(
      floor((value.cast("long") - lo) / width).cast("long"), lit(0L)),
      lit((nbins - 1).toLong))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wN = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val qlit = array(qs.map { case (n, d) =>
      struct(lit(n.toLong).as("num"), lit(d.toLong).as("den")) }: _*)
    // NULL values are dropped explicitly: a NULL bin would otherwise
    // ride the cumulative window under engine-specific NULL ordering
    // (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST) and skew
    // cum_cnt differently per engine. Oracle mirrors must filter the
    // same way.
    df.filter(value.isNotNull)
      .select(group.as("grp"), bin.as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("cnt"))
      .select(col("grp"), col("bin"),
        (lit(lo) + col("bin") * width).as("lo_edge"),
        sum("cnt").over(wCum).as("cum_cnt"))
      .withColumn("n", max("cum_cnt").over(wN))
      .select(col("grp"), col("lo_edge"), col("cum_cnt"), col("n"),
        explode(qlit).as("q"))
      // ceil(num·N/den) in pure integer arithmetic (`div` is integral):
      // a double num/den·N can straddle an integer boundary by one ulp
      .withColumn("target",
        greatest(expr("(q.num * n + q.den - 1) div q.den"), lit(1L)))
      .filter(col("cum_cnt") >= col("target"))
      .groupBy(col("grp"), col("q.num").as("num"), col("q.den").as("den"))
      .agg(min("lo_edge").as("q_est"))
  }

  /** Quantile read-off from a [[histogram]]: for each q, the smallest
    * bin whose cumulative count reaches ceil(q·N); the estimate is
    * that bin's LOWER edge (deterministic; true value lies within
    * [lo_edge, hi_edge)). Driver-side over the ≤ nbins collected rows
    * — the histogram IS the bounded sketch, reading it is free.
    */
  def histogramQuantiles(hist: DataFrame, qs: Seq[Double]): Seq[(Double, Long)] = {
    val rows = hist.orderBy("bin")
      .select("lo_edge", "cnt", "cum_cnt").collect()
    val n = if (rows.isEmpty) 0L else rows.last.getAs[Long]("cum_cnt")
    qs.map { q =>
      val target = math.ceil(q * n).toLong.max(1L)
      val row = rows.find(_.getAs[Long]("cum_cnt") >= target)
        .getOrElse(rows.last)
      (q, row.getAs[Long]("lo_edge"))
    }
  }
}
