package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-window token k-gram hashes as ONE native pass over the document
  * bytes: element `i` is a 16-byte (2 × 61-bit) polynomial hash of the
  * word k-gram starting at token `i` — the codegen'd replacement for
  * `transform(sequence(...), i -> concat_ws("_", element_at(...)...))`
  * + `md5`, whose higher-order lambda is interpreted per window
  * (CodegenFallback) and which allocates a gram string per window just
  * to hash it. Measured on the span-dedup entry: the whole gram stage
  * collapses into the scan projection.
  *
  * EQUALITY CONTRACT (what dedup needs): two windows hash equal iff
  * their `'_'`-joined gram strings are byte-equal — the hash runs over
  * the original text bytes with `' '` mapped to `'_'`, which IS the
  * joined gram string, so the hash's equality classes match the DuckDB
  * oracle's `tk[i+1] || '_' || ...` gram strings exactly (including
  * the join ambiguity for tokens containing '_': faithful mirroring
  * beats private cleverness when an oracle hash-compares downstream
  * results). Tokenization is `split(text, ' ')` semantics: consecutive
  * spaces yield empty tokens, an empty text yields one empty token;
  * fewer than k tokens → empty array (no window).
  *
  * COLLISION BOUND: two independent Rabin–Karp hashes mod the Mersenne
  * prime 2^61−1 (bases 131, 10007; Math.multiplyHigh mulmod — an
  * intrinsic on Java 17) give 122 effective bits: at 10^13 corpus
  * grams the expected collision count is ~10^26/2^123 ≈ 10^-11 —
  * collision-free for any realistic corpus, same class as md5-128.
  * Null text → null. O(n·k) byte-mulmods per doc (k is a small
  * constant; a rolling recurrence would save nothing measurable).
  */
case class TokenGramHash(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 1024, s"gram size $k out of range")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "graft_token_gram_hash"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_gram_hash requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    TokenGramHash.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenGramHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hashes($c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenGramHash =
    copy(child = newChild)
}

object TokenGramHash {
  private val M = (1L << 61) - 1
  private val B1 = 131L
  private val B2 = 10007L

  /** a·b mod 2^61−1 for a, b < 2^61 (Mersenne folding over the 128-bit
    * product; multiplyHigh is a JIT intrinsic).
    */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val folded = (lo & M) + ((lo >>> 61) | (hi << 3))
    (folded & M) + (folded >>> 61)
  }

  /** All k-gram hashes of `text` (see the equality contract above). */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    val b = text.getBytes
    val n = b.length
    // token boundaries under split(' ') semantics
    var nTok = 1
    var i = 0
    while (i < n) { if (b(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < n) {
      if (b(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val out = new Array[Any](nTok - k + 1)
    var w = 0
    while (w < out.length) {
      // hash the byte span of tokens [w, w+k) with ' ' read as '_' —
      // exactly the '_'-joined gram string, never materialized.
      // h starts at 1, NOT 0: with h0 = 0 a leading 0x00 byte is a
      // no-op in BOTH lanes simultaneously ("\u0000a..." would collide
      // with "a..." deterministically, defeating the dual hash); h0 = 1
      // makes every byte position contribute.
      var h1 = 1L
      var h2 = 1L
      var j = starts(w)
      val end = ends(w + k - 1)
      while (j < end) {
        val c: Long = (if (b(j) == ' ') '_' else b(j)) & 0xffL
        h1 = mulmod(h1, B1) + c
        h2 = mulmod(h2, B2) + c
        j += 1
      }
      h1 = (h1 & M) + (h1 >>> 61) // fold the +c carry back under 2^61
      h2 = (h2 & M) + (h2 >>> 61)
      val bytes = new Array[Byte](16)
      var s = 0
      while (s < 8) {
        bytes(s) = (h1 >>> (56 - 8 * s)).toByte
        bytes(s + 8) = (h2 >>> (56 - 8 * s)).toByte
        s += 1
      }
      out(w) = bytes
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form. */
  def apply(text: Column, k: Int): Column =
    GraftSqlBridge.column(TokenGramHash(GraftSqlBridge.expression(text), k))

  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_3100", Map("message" -> msg))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_token_gram_hash"),
    new ExpressionInfo(classOf[TokenGramHash].getName, "graft_token_gram_hash"),
    (children: Seq[Expression]) => {
      // analysis-time validation, not runtime ClassCastException (the
      // RollingMinHash registry rule)
      if (children.length != 2) analysisError(
        s"graft_token_gram_hash(text, k) takes 2 arguments, got ${children.length}")
      val kExpr = children(1)
      if (!kExpr.foldable) analysisError(
        "graft_token_gram_hash: gram size k must be a literal")
      val k: Long = kExpr.eval(null) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long    => l.longValue
        case s: java.lang.Short   => s.longValue
        case b: java.lang.Byte    => b.longValue
        case other => analysisError(
          s"graft_token_gram_hash: gram size k must be an integral literal, got $other")
      }
      if (k < 1 || k > 1024) analysisError(
        s"graft_token_gram_hash: gram size $k out of range [1, 1024]")
      TokenGramHash(children(0), k.toInt)
    })

  /** Register for SQL use on an existing session. */
  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(registryEntry._1, registryEntry._2, registryEntry._3)
}
