package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible alternative to
  * `DataFrame.sample` a training-data pipeline needs: membership is a
  * pure function of the row key (md5-derived, engine-independent), so a
  * sample is (a) exactly repeatable across runs/engines — the DuckDB
  * oracle replays it row for row, (b) stable under repartitioning and
  * retries (unlike RNG-per-partition `sample`, whose draw depends on
  * split layout), and (c) consistent across tables — sampling two
  * tables by the same key yields aligned rows (the "sample the user,
  * get all their events" property).
  *
  * Scale: both variants are pure narrow filters — no shuffle, no state;
  * Catalyst pushes the surviving-column pruning into the scan and the
  * filter runs at scan speed. The stratified variant's per-stratum rate
  * table rides along as a LITERAL map expression (strata are a declared
  * enum, not corpus-derived), so there is no rate-table join at all.
  *
  * Rates are parts-per-million integers: `keep iff
  * hash60(salt|key) mod 1e6 < ppm`. The hash is uniform on [0, 2^60),
  * and 2^60 mod 1e6 ≠ 0 introduces bias < 2^-40 — negligible, and
  * irrelevant to correctness since the oracle replays the same rule.
  */
object Sampling {

  private val Million = 1000000L

  /** The membership draw: uniform in [0, 1e6) as a function of
    * (salt, key). `salt` names the sample so independent samples of the
    * same corpus decorrelate.
    */
  def draw(salt: String, key: Column): Column =
    pmod(TextOps.hash60(concat(lit(salt + "|"), key.cast("string"))),
      lit(Million))

  /** Uniform sample: keep rows with draw < ppm (ppm ≈ rate × 1e6). */
  def uniform(df: DataFrame, key: Column, ppm: Long,
              salt: String = "smp"): DataFrame = {
    require(ppm >= 0 && ppm <= Million, s"ppm out of [0, 1e6]: $ppm")
    df.filter(draw(salt, key) < ppm)
  }

  /** Stratified sample: per-stratum ppm from a literal map (strata are
    * declared, e.g. languages), `defaultPpm` for unlisted strata. This
    * is how a pipeline rebalances a crawl — e.g. downsample English,
    * keep all low-resource languages.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 ppmByStratum: Map[String, Long], defaultPpm: Long,
                 salt: String = "smp"): DataFrame = {
    require((defaultPpm +: ppmByStratum.values.toSeq)
      .forall(p => p >= 0 && p <= Million), "ppm out of [0, 1e6]")
    val ppm = ppmByStratum.foldLeft(lit(defaultPpm)) {
      case (acc, (s, p)) => when(stratum === s, lit(p)).otherwise(acc)
    }
    df.filter(draw(salt, key) < ppm)
  }

  /** Exactly-k-per-stratum sample: the k rows with the SMALLEST draw in
    * each stratum (ties broken by key) — a fixed-size quota per group
    * where the rate variants give a fixed probability. Same
    * determinism/repeatability properties, and the k survivors of a
    * stratum are stable under corpus growth until smaller draws arrive
    * (bounded churn, unlike re-rolled RNG samples).
    *
    * Scale: one stratum-keyed window shuffle; rank ≤ k cuts inside the
    * window, so nothing beyond the stratum partitioning ever
    * materializes. Strata are assumed ≫ k but any single stratum is
    * one partition-group — same skew bound as any per-group top-k.
    */
  /** Deterministic train/val/test assignment: label each row by where
    * its draw falls in cumulative ppm bands — `splits = Seq("train" ->
    * 900000, "val" -> 50000, "test" -> 50000)` sends draw < 900000 to
    * train, < 950000 to val, the rest to test. The same membership
    * properties as [[uniform]] apply: the assignment is a pure function
    * of (salt, key), so it is repeatable across runs and engines,
    * stable under repartitioning, and a row NEVER migrates between
    * splits as the corpus grows (no leakage of val/test into train on
    * re-runs — the property RNG splits lack). Keying by a document id
    * keeps all chunks of a document in one split.
    *
    * NULL keys: the draw is NULL, every `<` comparison is false, and
    * the row lands in the LAST band (the CASE-otherwise semantic the
    * oracle shares) — deterministic, but note it differs from
    * [[uniform]], where a NULL key's row is filtered out.
    *
    * Scale: a pure narrow projection — no shuffle, no state; the label
    * is one md5 + a literal CASE chain at scan speed.
    */
  def splitLabels(df: DataFrame, key: Column, splits: Seq[(String, Long)],
                  labelCol: String = "split",
                  salt: String = "tvt"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "bad split spec")
    require(splits.map(_._2).sum == Million,
      s"split ppms must sum to 1e6: ${splits.map(_._2).sum}")
    require(!df.columns.contains(labelCol),
      s"input must not carry a $labelCol column")
    val d = draw(salt, key)
    val cuts = splits.scanLeft(0L)(_ + _._2).tail
    // last band is `otherwise` so the full [0, 1e6) range is covered
    val label = splits.init.zip(cuts.init).foldRight(
      lit(splits.last._1): Column) {
      case (((name, _), cut), acc) => when(d < cut, name).otherwise(acc)
    }
    df.withColumn(labelCol, label)
  }

  def topKPerStratum(df: DataFrame, key: Column, stratum: Column, k: Int,
                     salt: String = "smp"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // the working rank column must not shadow (and then drop) caller
    // data — same contract as SaltedJoin's _graft_salt guard
    val rk = "_graft_rk"
    require(!df.columns.contains(rk), s"input must not carry a $rk column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(draw(salt, key).asc, key.asc)
    df.withColumn(rk, row_number().over(w)).filter(col(rk) <= k)
      .drop(rk)
  }

  /** Weighted sample: per-row keep PROBABILITY from a column — the
    * importance-resampling primitive (keep probability ∝ a quality or
    * length signal) that [[uniform]]/[[stratified]] special-case to a
    * constant/enum rate. `ppm` may be any integer expression in
    * [0, 1e6]; e.g. `least(lit(1000000L), n_tokens * 12000)` keeps a
    * document with probability proportional to its token count, making
    * the survivors an (approximately) unbiased TOKEN-level subsample of
    * the corpus — the draw a mixture pipeline uses when its budget is
    * tokens, not documents. Same determinism contract as [[uniform]]:
    * membership is a pure function of (salt, key, ppm-inputs), so the
    * oracle replays it row for row.
    *
    * Scale: a pure narrow filter — no shuffle, no state; weight
    * evaluation and the md5 draw both run at scan speed. Keep the ppm
    * expression integer-only (as the examples above) and the decision
    * is bit-deterministic on every engine.
    */
  def weighted(df: DataFrame, key: Column, ppm: Column,
               salt: String = "wsmp"): DataFrame =
    df.filter(draw(salt, key) < ppm)

  /** Greedy per-group token-budget fill — the data-MIXTURE primitive:
    * each group (source, domain, language …) contributes documents in
    * deterministic draw order until its token budget is exhausted.
    * This is how a training run realizes "40 % web, 30 % code, …" as
    * exact token counts: order each group by the same (draw, key) the
    * sampling family uses, admit a document iff the tokens BEFORE it
    * are still under the group's budget (so the admitted set is a
    * prefix of the group's draw order, and the last admitted document
    * may straddle the boundary — greedy fill, never a partial doc).
    * Returns the admitted rows plus `cum_before` (tokens admitted
    * ahead of the row) — the evidence column the oracle replays.
    *
    * Because admission = `cum_before < budget` and the running sum is
    * monotone, a row's fate never depends on later rows: the operator
    * is incremental (its streaming twin carries ONE counter per group
    * as state) and the admitted set is stable under corpus growth
    * until smaller draws arrive — the same bounded-churn property as
    * [[topKPerStratum]].
    *
    * Scale — a DISTRIBUTED prefix sum, never one sort task per group.
    * The draw is uniform on [0, 1e6), so fixed cut points split each
    * group into [[MixBuckets]] draw-range buckets that are (a) a pure
    * function of the draw — no sampling pass needed — and (b)
    * balanced by uniformity. The plan is then:
    *   1. one map-side-combinable aggregation to per-(group, bucket)
    *      token subtotals — a |groups| × [[MixBuckets]] table;
    *   2. a driver-side prefix over that tiny table → each bucket's
    *      START offset (tokens in all strictly-smaller buckets of the
    *      same group), broadcast back as a join;
    *   3. buckets whose start offset already meets the budget are
    *      dropped BEFORE the window (every row there has
    *      `cum_before ≥ offset ≥ budget`), so a group whose budget is
    *      a sliver of its corpus share windows only the prefix
    *      buckets that can still admit — the over-scan the old
    *      single-chain plan suffered is gone;
    *   4. the running-sum window runs within (group, bucket) + the
    *      broadcast offset — |groups| × [[MixBuckets]] parallel
    *      chains instead of |groups| serial ones.
    * Output is bit-identical to the single-window form: bucket order
    * refines draw order (bucket = draw / width), so offset + the
    * within-bucket running sum IS the group-wide running sum.
    *
    * CONTRACT — eager two-pass (r13 ADVICE): step 1's subtotal
    * aggregation runs a job AT CALL TIME, and the returned plan
    * evaluates `df` a SECOND time. The input must therefore be
    * deterministic across evaluations — a parquet scan, a
    * deterministic projection chain, or a [[Caches.materialize]]d
    * frame (what the pl_p3 composition passes). A nondeterministic
    * input (fresh `rand()`, an un-checkpointed sample with changing
    * lineage, a re-read of mutating storage) would subtotal one
    * population and window another, silently corrupting
    * `cum_before`. Bucket count: scale-aware by default — see
    * [[mixBucketsFor]]; pass `buckets` explicitly to pin it.
    */
  def tokenBudgetMix(df: DataFrame, key: Column, group: Column,
                     tokens: Column, budgetByGroup: Map[String, Long],
                     defaultBudget: Long,
                     salt: String = "mix",
                     buckets: Int = 0): DataFrame = {
    require((defaultBudget +: budgetByGroup.values.toSeq).forall(_ >= 0),
      "budgets must be >= 0")
    val nBuckets =
      if (buckets > 0) buckets else mixBucketsFor(df.sparkSession)
    require(Million % nBuckets == 0,
      s"bucket count must divide 1e6, got $nBuckets")
    val bucketWidth = Million / nBuckets
    val cb = "cum_before"
    val work = Seq("_graft_drw", "_graft_grp", "_graft_bkt")
    (cb +: work).foreach(c => require(!df.columns.contains(c),
      s"input must not carry a $c column"))
    def budgetOf(g: Column): Column = budgetByGroup.foldLeft(
      lit(defaultBudget): Column) {
      case (acc, (name, b)) => when(g === name, lit(b)).otherwise(acc)
    }
    // bucket = fixed draw range; NULL draws (null keys) get bucket -1
    // so they sort first, matching the old orderBy's nulls-first.
    val base = df
      .withColumn("_graft_drw", draw(salt, key))
      .withColumn("_graft_bkt", when(col("_graft_drw").isNull, lit(-1))
        .otherwise(floor(col("_graft_drw") / lit(bucketWidth))
          .cast("int")))
      .withColumn("_graft_grp", group.cast("string"))

    // per-(group, bucket) subtotals: |groups| × MixBuckets rows — the
    // one deliberately-tiny collect (same discipline as the Bda
    // sizing frames); prefix-summed on the driver in bucket order.
    val subtotals = base.groupBy(col("_graft_grp"), col("_graft_bkt"))
      .agg(coalesce(sum(tokens), lit(0L)).as("_graft_sub"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getInt(1), r.getLong(2)))
    val offsets: Seq[(String, Int, Long)] = subtotals
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        val inOrder = rows.sortBy(_._2)
        inOrder.zip(inOrder.scanLeft(0L)(_ + _._3))
          .map { case ((_, b, _), off) => (g, b, off) }
      }
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(offsets)
      .toDF("_graft_ogrp", "_graft_obkt", "_graft_off")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_graft_grp"), col("_graft_bkt"))
      .orderBy(col("_graft_drw").asc, key.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base
      .join(broadcast(offDf),
        col("_graft_grp") <=> col("_graft_ogrp") &&
          col("_graft_bkt") === col("_graft_obkt"))
      // a bucket starting at/past the budget can never admit a row
      .filter(col("_graft_off") < budgetOf(col("_graft_grp")))
      .withColumn(cb,
        col("_graft_off") + coalesce(sum(tokens).over(w), lit(0L)))
      .filter(col(cb) < budgetOf(col("_graft_grp")))
      .drop("_graft_drw", "_graft_grp", "_graft_bkt",
        "_graft_ogrp", "_graft_obkt", "_graft_off")
  }

  /** Floor for [[tokenBudgetMix]]'s draw-range bucket count. The
    * effective count is scale-aware — see [[mixBucketsFor]].
    */
  val MixBuckets: Int = 64

  /** All divisors of 1e6 (2^a·5^b, a,b ∈ 0..6), ascending — the legal
    * bucket counts: a divisor keeps every bucket boundary an integral
    * draw value, so bucketing is a pure function of the draw.
    */
  private val MixDivisors: Seq[Int] =
    (for (a <- 0 to 6; b <- 0 to 6)
      yield (1 << a) * math.pow(5, b).toInt).sorted

  /** Scale-aware bucket count (r13 #4): the window chains are the only
    * sequential part of the prefix sum — chain length ~
    * N/(|groups|·buckets) — so the count must grow with the
    * parallelism the session was sized for, not sit at a constant 64
    * tuned for local[32]. Smallest divisor of 1e6 that is ≥
    * max([[MixBuckets]], spark.sql.shuffle.partitions): a 2000-
    * partition cluster session gets 2000 buckets, local[32] (shuffle
    * partitions 32) keeps the original 64 — bit-identical output
    * either way, because `cum_before` = bucket offset + within-bucket
    * prefix IS the group-wide running sum for ANY bucket count (bucket
    * refines draw order). The driver-side subtotal table stays
    * |groups| × buckets rows — tiny at any plausible setting.
    */
  def mixBucketsFor(spark: org.apache.spark.sql.SparkSession): Int = {
    val target = math.max(MixBuckets,
      spark.sessionState.conf.numShufflePartitions)
    MixDivisors.find(_ >= target).getOrElse(Million.toInt)
  }
}
