package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language ID, fingerprints.
  *
  * Everything here is a pure per-row projection built from native
  * Catalyst higher-order functions (transform/filter/aggregate) — no
  * UDFs, no explode, no shuffle — so at 100 TB each operator runs
  * embarrassingly parallel inside whole-stage codegen at scan speed.
  *
  * Cross-engine exactness: the only hash used is md5 (identical hex on
  * any engine); [[hash60]] folds its first 15 hex chars into a
  * non-negative 60-bit BIGINT, reproducible in DuckDB as
  * `CAST('0x' || substring(md5(x),1,15) AS BIGINT)`.
  */
object TextOps {

  /** 60-bit non-negative hash of a string column via md5 hex. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Same hash computed driver-side (for tiny literal tables like LSH
    * hyperplane coefficients — computed once, shipped as literals).
    */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Normalizing tokenizer for real-world corpora (opt-in — the oracle
    * corpus contract stays single-space [[tokens]]): split on
    * whitespace-class RUNS, strip leading/trailing ASCII punctuation
    * per token, lowercase, drop empties. The whitespace class is the
    * EXPLICIT set `[ \t\n\r\f]` — Java's `\s` includes `\x0B` while
    * RE2's does not, so a shorthand class would silently diverge
    * between engines on vertical tabs; Java `\p{Punct}` and RE2
    * `[[:punct:]]` are the same ASCII set and `lower` agrees on ASCII,
    * so DuckDB's
    * `list_filter(list_transform(regexp_split_to_array(lower(text),
    * '[ \t\n\r\f]+'), t -> regexp_replace(t,
    * '^[[:punct:]]+|[[:punct:]]+$', '', 'g')), t -> t <> '')`
    * reproduces it token for token (pl_t11's contract). Pure
    * projection — same scan-speed story as [[tokens]]; accepted by the
    * dedup/chunking operators via their `tokenizer` parameter.
    */
  def tokensNorm(text: Column): Column =
    filter(
      transform(split(lower(text), "[ \\t\\n\\r\\f]+"),
        t => regexp_replace(t, "^\\p{Punct}+|\\p{Punct}+$", "")),
      t => t =!= "")

  /** Word k-shingles: ["a","b","c","d"], k=3 → ["a_b_c","b_c_d"]. */
  def shingles(toks: Column, k: Int = 3): Column =
    transform(sequence(lit(0), size(toks) - k), i =>
      concat_ws("_", (0 until k).map(j => element_at(toks, i + j + 1)): _*))

  val Stopwords = Seq("the", "a")

  /** Per-doc token statistics (counts as BIGINT for oracle parity).
    * The token array is staged as a column once so the five statistics
    * don't each re-evaluate the split.
    */
  def withTokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col("_toks")
    df.withColumn("_toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(t).cast("bigint"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("bigint"))
      .withColumn("sum_token_len",
        aggregate(t, lit(0L), (acc, x) => acc + length(x)))
      .withColumn("max_token_len",
        array_max(transform(t, x => length(x))).cast("bigint"))
      .withColumn("n_stopwords",
        size(filter(t, x => x.isin(Stopwords: _*))).cast("bigint"))
      .drop("_toks")
  }

  /** Quality signals + keep decision (heuristics in the spirit of
    * C4/Gopher-style corpus filtering). Ratios are exact: both factors
    * are integers identical on every engine, and IEEE division of
    * identical doubles is deterministic.
    */
  def withQuality(df: DataFrame): DataFrame =
    withTokenStats(df)
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_tokens"))
      .withColumn("distinct_ratio",
        col("n_distinct_tokens").cast("double") / col("n_tokens"))
      .withColumn("mean_token_len",
        col("sum_token_len").cast("double") / col("n_tokens"))
      .withColumn("keep",
        col("n_tokens") >= 20 && col("n_tokens") <= 95 &&
          col("distinct_ratio") >= 0.45 && col("stopword_ratio") <= 0.25)

  /** Within-document repetition metrics — the Gopher repetition
    * filters' shape (Rae et al. 2021, appendix A1: "duplicate n-gram
    * fraction") at word-2-gram grain: `rep_frac` is the fraction of
    * gram occurrences that repeat an earlier occurrence in the same
    * doc (1 - distinct/total), `max_gram_count` the burstiest gram's
    * occurrence count (a looping generator or boilerplate template
    * sends it to tens). Catches the repetitive-junk documents a
    * vocabulary-level distinct_ratio misses: a doc cycling three
    * sentences has healthy token diversity but rep_frac → 1.
    *
    * Scale: a pure narrow projection — grams are the codegen'd
    * [[graft.expressions.TokenGramHash]] byte pass staged ONCE and
    * sorted; the run-length fold is a single O(G) `aggregate` over
    * the sorted array. No shuffle, no state, scan-speed; per-doc cost
    * bounded by doc length.
    */
  def withRepetition(df: DataFrame, n: Int = 2): DataFrame = {
    val g = col("_g")
    // longest equal run in the SORTED gram array == max occurrence
    // count of any gram; one fold, no per-gram rescan
    val maxRun = aggregate(g,
      struct(lit(null).cast("binary").as("prev"),
        lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && acc("prev") === x,
          acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    df.withColumn("_g",
        array_sort(graft.expressions.TokenGramHash(col("text"), n)))
      .withColumn("n_grams", size(g).cast("bigint"))
      .withColumn("n_distinct_grams", size(array_distinct(g)).cast("bigint"))
      .withColumn("rep_frac", when(col("n_grams") === 0L, lit(0.0))
        .otherwise((col("n_grams") - col("n_distinct_grams")).cast("double") /
          col("n_grams").cast("double")))
      .withColumn("max_gram_count", maxRun)
      .drop("_g")
  }

  /** Corpus-bigram language-model fluency scoring — the
    * perplexity-style filter (CCNet/KenLM shape: score each document
    * by how probable its token continuations are under a model trained
    * on the corpus itself) realized with INTEGER-EXACT statistics so
    * the whole thing is oracle-checkable: no `ln`, no float
    * accumulation order anywhere. The "model" is the corpus bigram
    * table; a doc bigram (w1, w2) is *common* when its conditional
    * probability c(w1,w2)/c(w1·) clears 1/5 (compared as the integer
    * inequality `5·c12 ≥ c1`, where c1 counts w1's continuation slots
    * corpus-wide), and *rare* when the bigram occurs nowhere else
    * (c12 ≤ 1). Per doc: `n_bigrams`, `n_common`, `n_rare`, and
    * `common_ratio = n_common / n_bigrams` — a high-rare low-common
    * doc is the disfluent/garbled outlier a perplexity filter drops.
    * Documents with < 2 tokens have no bigrams and no output row.
    *
    * Scale: the corpus is exploded ONCE into a map-side-combined
    * (doc, w1, w2) → count aggregation; everything downstream is
    * bounded by distinct (doc, bigram), never raw occurrences. The
    * corpus bigram table is Σ_doc of that frame, and the context
    * table is pure algebra on the bigram table
    * (c(w1·) = Σ_w2 c(w1,w2)) — vocabulary-scale input, NOT a second
    * corpus pass. One corpus scan total; every shuffle keyed; counts
    * are exact int64s so common/rare decisions are bit-deterministic
    * on any engine.
    */
  def bigramLmScores(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val pairs = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2), i =>
        struct(element_at(t, i + 1).as("w1"), element_at(t, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val dbg = docs.select(col("doc_id"), explode(pairs).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
      .groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("dc"))
    val cBi = dbg.groupBy("w1", "w2").agg(sum("dc").as("c12"))
    val cCtx = cBi.groupBy("w1").agg(sum("c12").as("c1"))
    dbg.join(cBi, Seq("w1", "w2")).join(cCtx, Seq("w1"))
      .groupBy("doc_id")
      .agg(sum("dc").cast("long").as("n_bigrams"),
        sum(when(col("c12") * 5L >= col("c1"), col("dc")).otherwise(0L))
          .cast("long").as("n_common"),
        sum(when(col("c12") <= 1L, col("dc")).otherwise(0L))
          .cast("long").as("n_rare"))
      .withColumn("common_ratio",
        col("n_common").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Document fingerprints: full-text md5 (exact dedup key) + the
    * lexicographic min over shingle md5s (a MinHash with one hash
    * function — a stable content fingerprint robust to local edits).
    */
  def withFingerprints(df: DataFrame, textCol: String = "text"): DataFrame =
    // tokens staged as a real column first: an inlined split() inside
    // the shingle lambda is re-evaluated per element_at (measured 9x)
    df.withColumn("_tk", tokens(col(textCol)))
      .withColumn("_sh", shingles(col("_tk")))
      .withColumn("md5_fp", md5(col(textCol)))
      .withColumn("min_shingle_fp", array_min(transform(col("_sh"), s => md5(s))))
      .withColumn("n_shingles", size(array_distinct(col("_sh"))).cast("bigint"))
      .drop("_sh", "_tk")

  /** Denylist scrubbing: mask every whole-word occurrence of `terms`
    * (the PII-redaction / boilerplate-removal shape — emails, phones,
    * banned phrases — specialized to a literal term set since the
    * synthetic corpus carries no real PII) and count what was masked
    * per document. The alternation is anchored on `\b` word
    * boundaries, which mean the same thing in Java regex and RE2, so
    * "customers" survives a "customer" denylist on both engines and
    * the oracle replays the masking byte for byte.
    *
    * Scale: a pure narrow projection — two regex passes per row at
    * scan speed, no shuffle, no state; the pattern is a literal
    * compiled once per task.
    */
  def redactTerms(df: DataFrame, terms: Seq[String],
                  mask: String = "[REDACTED]",
                  textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "empty denylist")
    require(terms.forall(_.matches("[A-Za-z0-9_]+")),
      s"denylist terms must be plain words (regex-safe): $terms")
    val pat = "\\b(" + terms.mkString("|") + ")\\b"
    df.withColumn("n_redacted",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("bigint"))
      .withColumn(textCol, regexp_replace(col(textCol), pat, mask))
  }

  /** BPE-style pre-tokenizer regex (GPT-2 flavor, reduced to the
    * RE2-compatible subset — no lookahead — so any engine tokenizes
    * identically): letter runs, digit runs, punctuation runs, each with
    * an optional leading space.
    */
  val BpePattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"

  /** Token counting, whitespace + BPE-ish regex (both counts). */
  def withTokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_ws_tokens", size(tokens(col(textCol))).cast("bigint"))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(textCol), lit(BpePattern), lit(0))).cast("bigint"))

  /** Rolling-hash content fingerprint (Rabin-Karp winnowing): the
    * minimum polynomial hash over every k-byte window — robust to
    * local edits like the shingle MinHash but at character grain.
    * A TRUE rolling recurrence via the native codegen expression
    * [[graft.expressions.RollingMinHash]]: one O(n) primitive loop per
    * document (the previous formulation paid an md5 digest per
    * window). The oracle mirrors the same mod-2³¹−1 integer steps with
    * literal power coefficients (PipelineQueries.rollingFpSql).
    */
  def withRollingFingerprint(df: DataFrame, k: Int = 16,
                             textCol: String = "text"): DataFrame =
    df.withColumn("rolling_fp",
      graft.expressions.RollingMinHash(col(textCol), k))

  /** PII-pattern detection stats — the scrubbing TRIAGE step before
    * [[redactTerms]]-style masking: per-doc counts of email-, US-phone-
    * and SSN-shaped substrings plus a `has_pii` routing flag. Patterns
    * are the RE2-compatible subset (no lookaround; ASCII `\b`) so any
    * engine counts identically; they are deliberately shape-based
    * (detection recall is a corpus-policy question — the operator's
    * contract is exact countability, not NER).
    *
    * Scale: three codegen'd regex projections at scan speed — no
    * shuffle, no state.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  def withPiiStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    // null text must triage as "no PII found" (0/false), not null —
    // a has_pii consumer filtering the flag would silently drop
    // null-text docs otherwise (size/regexp propagate null)
    def n(pat: String) = coalesce(
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("bigint"),
      lit(0L))
    df.withColumn("n_emails", n(EmailPattern))
      .withColumn("n_phones", n(PhonePattern))
      .withColumn("n_ssns", n(SsnPattern))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ssns") > 0L)
  }

  /** Corpus-relative rare-token scoring — the exactly-computable core
    * of an LM-based quality signal: the fraction of a doc's token
    * INSTANCES whose corpus-wide frequency is at or below `permille`‰
    * of all token instances (gibberish, OCR noise and boilerplate IDs
    * concentrate rare tokens; log-perplexity itself is not bit-stable
    * cross-engine, an integer threshold on the same counts is). Rare
    * iff `freq * 1000 <= permille * total` — all-integer, then ONE
    * IEEE division for the fraction (deterministic, the tfidf rule).
    * Docs with no nonempty tokens emit no row (mirrors the tf stage).
    *
    * Scale: term-count aggregate (one shuffle with map-side combine),
    * term-keyed join back to the postings (no broadcast hint — the
    * vocabulary is corpus-dependent, AQE demotes when it measures
    * small), doc-keyed final aggregate. Unlike TF-IDF, the corpus
    * total is computed inside the plan — construction is job-free.
    */
  def rarityScores(docs: DataFrame, permille: Long = 1,
                   textCol: String = "text"): DataFrame = {
    require(permille >= 1 && permille <= 1000, s"permille in [1,1000]: $permille")
    val toks = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
    // corpus total computed INSIDE the plan: a 1-row global aggregate
    // cross-joined as a broadcast scalar onto the postings (plans a
    // BroadcastNestedLoopJoin with a single-row build — O(rows·1), the
    // canonical scalar-attach, NOT a fact×fact loop; PlanShapeSpec pins
    // exactly this shape). Plan construction stays job-free, so
    // composing this into a larger pipeline never serializes on an
    // eager count (ADVICE r9).
    val total = toks.agg(count(lit(1)).as("_total"))
    val freq = toks.groupBy("term").agg(count(lit(1)).as("freq"))
    toks.join(freq, "term")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("freq") * 1000L <= lit(permille) * col("_total"), 1L)
          .otherwise(0L)).as("n_rare"))
      .withColumn("rare_frac",
        col("n_rare").cast("double") / col("n_tokens").cast("double"))
  }

  /** Fixed-size token chunking with stride — the sequence-window stage
    * that turns documents into training-context-sized pieces (tokenizer
    * "overflow with stride" semantics): chunk i covers tokens
    * [i·stride, i·stride + size); starts run while they expose new
    * tokens, so the final chunk may be a shorter tail and a document
    * shorter than `size` yields exactly one chunk. Every doc appears
    * (empty text → one empty chunk — the caller's quality gate, not the
    * chunker, drops empties).
    *
    * Scale: the token array is staged ONCE per doc below the Generate
    * (the documented no-CSE staging rule — inlined, `split` would rerun
    * per chunk row), then a bounded posexplode of ceil(max(n-size,0)/
    * stride)+1 chunk indices and a `slice` per chunk. Narrow, no
    * shuffle, no state; output is ≈ (1 + overlap) × corpus tokens.
    */
  def chunkTokens(docs: DataFrame, chunkSize: Int, stride: Int,
                  textCol: String = "text",
                  tokenizer: Column => Column = tokens): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs
      .withColumn("_tk", tokenizer(col(textCol)))
      .withColumn("_nc", // number of chunks - 1 (integer ceil-div)
        floor((greatest(size(col("_tk")) - chunkSize, lit(0)) + (stride - 1))
          / stride).cast("int"))
      .select(col("doc_id"), col("_tk"),
        posexplode(sequence(lit(0), col("_nc"))).as(Seq("chunk_idx", "_i")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ",
          slice(col("_tk"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("_tk"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** Greedy sequence packing (the GPT-style concat-then-cut layout):
    * documents are concatenated in doc_id order within a shard and cut
    * into fixed-budget token sequences; each doc is tagged with its
    * token start offset in the shard's stream and the sequence its
    * first token lands in. This is the example-packing stage between
    * chunking and the trainer — it decides which docs share a context
    * window (and therefore which cross-doc attention masks apply).
    *
    * Scale: packing is embarrassingly parallel across shards — the
    * production layout runs one packer per output shard, and `shard =
    * doc_id mod shards` makes the assignment deterministic and
    * layout-independent. Within a shard the offsets are ONE
    * running-sum window over the shard partitioning; no global sort,
    * no driver state. Shard count is the parallelism knob: at 100 TB
    * it goes to the output-file count, keeping every window group
    * executor-sized.
    */
  def packSequences(df: DataFrame, seqLen: Int, shards: Int = 8,
                    tokenizer: Column => Column = tokens): DataFrame = {
    require(seqLen >= 1 && shards >= 1,
      s"need seqLen >= 1 and shards >= 1, got seqLen=$seqLen shards=$shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("n_tokens", size(tokenizer(col("text"))).cast("bigint"))
      .withColumn("start_off", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_id", expr(s"start_off div $seqLen"))
  }

  /** Per-sequence packing composition — the attention-mask input a
    * trainer actually consumes: for every (sequence, document) overlap
    * one row `(shard, seq_id, doc_id, span_start, span_len)`, where
    * `span_start` is the doc fragment's offset INSIDE the sequence and
    * `span_len` its token count. A doc spanning a sequence cut emits
    * one row per sequence it touches (so Σ span_len per doc =
    * n_tokens, and Σ span_len per full sequence = seqLen — the
    * mask-builder invariants). Note an empty text still carries ONE
    * empty token (`split("") → [""]`, the documented chunker
    * semantics) and so occupies one slot; the n_tokens > 0 guard is
    * for genuinely zero-length token arrays only.
    *
    * Scale: [[packSequences]]'s running-sum window (one shard-keyed
    * shuffle) plus a BOUNDED posexplode — a doc of n tokens touches
    * ≤ n/seqLen + 1 sequences, so output is ≈ corpus/seqLen + docs
    * rows. No extra shuffle, no join, no driver state.
    */
  def packSpans(df: DataFrame, seqLen: Int, shards: Int = 8,
                tokenizer: Column => Column = tokens): DataFrame = {
    val packed = packSequences(df, seqLen, shards, tokenizer)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_off"))
      .filter(col("n_tokens") > 0L)
    packed
      // sequences touched: floor(start/L) .. floor((end-1)/L), end exclusive
      .withColumn("_end_off", col("start_off") + col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("start_off"), col("_end_off"),
        explode(sequence(expr(s"start_off div $seqLen"),
          expr(s"(_end_off - 1) div $seqLen"))).as("seq_id"))
      .withColumn("_seq_base", col("seq_id") * seqLen)
      .select(col("shard"), col("seq_id"), col("doc_id"),
        (greatest(col("start_off"), col("_seq_base")) - col("_seq_base"))
          .as("span_start"),
        (least(col("_end_off"), col("_seq_base") + seqLen) -
          greatest(col("start_off"), col("_seq_base"))).as("span_len"))
  }

  /** TF-IDF top-k terms per document — the classic salience ranking a
    * corpus pipeline uses for keyword extraction / topic hints.
    *
    * Exactness contract: the usual `ln(N/df)` idf is NOT cross-engine
    * bit-stable (libm vs Math.log differ in the last ulp), so the score
    * is the RATIONAL form `tf * N / df`: `tf * N` is an exact integer
    * (< 2^53 at any realistic tf), and one IEEE division of identical
    * integers is deterministic on every engine. Ranking by the rational
    * score orders identically to `tf * (N/df)` idf weighting.
    *
    * Scale: tf is one (doc_id, term)-keyed shuffle with map-side
    * combine; df derives from the tf frame by a term-keyed shuffle
    * (counting (doc,term) rows = docs containing term, no distinct
    * needed); the tf⋈df join carries no broadcast hint — vocabulary is
    * corpus-dependent, so AQE picks broadcast only when df measures
    * small. N arrives as a literal from a column-pruned count(*) —
    * NOTE this makes the builder run one metadata-scale Spark job at
    * plan-construction time. The lazy alternative (joining a one-row
    * count aggregate) was tried and rejected: Catalyst folds the
    * constant join key and plans a BroadcastNestedLoopJoin, trading an
    * upfront count for a nested-loop node that the no-NLJ plan guard
    * exists to forbid. The final top-k is a doc_id-partitioned
    * window — keyed, never a global sort.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 5,
                textCol: String = "text"): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score",
        (col("tf") * lit(n)).cast("double") / col("df").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }

  /** Language ID, corpus-profile flavor: a training pass counts, per
    * (lang, token), how many labeled docs contain the token; scoring
    * sums those counts over a doc's distinct tokens and argmaxes
    * (ties → lexicographically smallest lang). The profile is a
    * lang×vocab table — usually broadcast-sized, but vocab on a crawl
    * corpus is NOT bounded, so the scoring join carries no forced
    * broadcast hint: below `spark.sql.autoBroadcastJoinThreshold` AQE
    * demotes it to a broadcast join (measured, not estimated — the
    * profile sits behind its own shuffle stage), above it the join
    * falls back to a token-keyed shuffle join, which is the correct
    * 100 TB plan for an oversized profile. Returns
    * (doc_id, lang, pred_lang).
    */
  def languageId(docs: DataFrame): DataFrame = {
    // The exploded token frame feeds BOTH the profile build and the
    // scoring join. Deliberately NOT persisted: the exploded frame is
    // ~avg_tokens× the corpus, so caching it stores far more bytes than
    // the second scan-and-explode costs — at 100 TB, two streaming
    // passes over the parquet scan beat materializing a 10× blow-up
    // (and a session-lifetime cache with no release path leaks it).
    val docTok = docs
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
    val profile = docTok
      .groupBy(col("lang").as("p_lang"), col("tok"))
      .agg(count(lit(1)).as("w"))
    val scored = docTok.drop("lang")
      .join(profile, "tok")
      .groupBy("doc_id", "p_lang")
      .agg(sum("w").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("p_lang").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("p_lang").as("pred_lang"))
      .join(docs.select("doc_id", "lang"), "doc_id")
  }

  /** Relative (distribution-adaptive) quality gating — the
    * FineWeb-style move where the cutoff is not a fixed constant but a
    * per-group quantile of the corpus's own distribution ("keep docs
    * at or above their language's median length"): fixed thresholds
    * tuned on English prose misfire on languages and registers whose
    * distributions sit elsewhere. The threshold per group is the
    * `q = num/den` quantile of `value` read off the integer histogram
    * sketch ([[Sketches.histogramGroupedQuantiles]] — deterministic,
    * mergeable, no per-group sort), and the output is one row per
    * group: (grp, thr, n_docs, n_kept) with `n_kept` = rows whose
    * value reaches the group's own threshold. All counts int64; the
    * threshold is a histogram bin edge (exact integer) — nothing to
    * round, hash-gated with no tolerance.
    *
    * Scale: the sketch is one group-keyed aggregation over (group,
    * bin) — at most groups×nbins rows — and the threshold table is
    * groups-sized, so the gate join broadcasts; the final card is a
    * second group-keyed aggregation. Two corpus scans (sketch +
    * gate), both scan-speed projections; no corpus-scale shuffle ever
    * carries more than groups×nbins rows.
    */
  def relativeThresholdCard(df: DataFrame, group: Column, value: Column,
      lo: Long, hi: Long, nbins: Int, q: (Int, Int) = (1, 2)): DataFrame = {
    val thr = Sketches.histogramGroupedQuantiles(
        df, group, value, lo, hi, nbins, Seq(q))
      .select(col("grp"), col("q_est").as("thr"))
    df.select(group.as("grp"), value.as("v"))
      .join(thr, "grp")
      .groupBy("grp")
      .agg(max(col("thr")).as("thr"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("v") >= col("thr"), 1L).otherwise(0L)).as("n_kept"))
  }
}
