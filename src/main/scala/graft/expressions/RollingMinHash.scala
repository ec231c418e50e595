package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style content fingerprint as a TRUE Rabin–Karp rolling
  * hash (the thing `TextOps.withRollingFingerprint` previously only
  * approximated with an md5 per window): the polynomial hash
  *
  *   h(w_i) = Σ_{j=0..k-1} byte(i+j) · B^{k-1-j}  (mod M)
  *
  * of every k-byte window, via the O(1) rolling recurrence
  *
  *   h_{i+1} = ((h_i − byte(i)·B^{k-1}) · B + byte(i+k))  (mod M)
  *
  * returning the minimum window hash — ONE O(n) pass per document
  * inside whole-stage codegen (`doGenCode` emits the primitive loop),
  * replacing O(n) md5 digests per row. The brief's extension path (b):
  * a scalar kernel no built-in expression composition can run without
  * per-window rework.
  *
  * Parameters are fixed so the DuckDB oracle can mirror the exact
  * integer steps with literal power-of-B coefficients:
  * B = 257, M = 2^31 − 1 (Mersenne). All intermediates stay < 2^40 —
  * exact in BIGINT on any engine. Hashing is BYTE-grain; for the ASCII
  * corpora this equals the code-point grain DuckDB's `unicode()` sees
  * (verified: max code point in the test corpus is 121).
  *
  * Null semantics: null input → null; shorter-than-k input → null
  * (no window exists).
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 64, s"window size $k out of range")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_min_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_min_hash requires STRING, got ${child.dataType.sql}")

  // empty window (len < k) produces no hash
  override def nullable: Boolean = true

  // B^(k-1) computed once per expression instance, not once per row
  // (k-1 modular multiplications otherwise re-run on every eval)
  @transient private lazy val lead = RollingMinHash.leadPow(k)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingMinHash.minHash(bytes, k, lead)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingMinHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      // lead coefficient baked in as a compile-time literal
      s"""
         |byte[] $bytes = $c.getBytes();
         |if ($bytes.length < $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $cls.minHashLong($bytes, $k, ${lead}L);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  val B = 257L
  val M = 2147483647L // 2^31 - 1

  /** B^(k-1) mod M — the coefficient of the byte leaving the window. */
  def leadPow(k: Int): Long = {
    var p = 1L
    var i = 1
    while (i < k) { p = p * B % M; i += 1 }
    p
  }

  /** Boxed form for nullSafeEval (null when no window exists). */
  def minHash(bytes: Array[Byte], k: Int, lead: Long): java.lang.Long =
    if (bytes.length < k) null
    else java.lang.Long.valueOf(minHashLong(bytes, k, lead))

  /** The primitive kernel shared by eval and generated code; `lead` is
    * the pre-hoisted B^(k-1) mod M ([[leadPow]]).
    */
  def minHashLong(bytes: Array[Byte], k: Int, lead: Long): Long = {
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xffL)) % M; i += 1 }
    var min = h
    while (i < bytes.length) {
      // ((h - out*lead) mod M + M) stays positive; * B + in < 2^40
      h = ((h - (bytes(i - k) & 0xffL) * lead % M + M) % M * B +
        (bytes(i) & 0xffL)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-API form (used by graft.pipeline.TextOps). */
  def apply(text: Column, k: Int): Column =
    GraftSqlBridge.column(RollingMinHash(GraftSqlBridge.expression(text), k))

  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_3100", Map("message" -> msg))

  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_min_hash"),
    new ExpressionInfo(classOf[RollingMinHash].getName, "graft_rolling_min_hash"),
    (children: Seq[Expression]) => {
      // validate here, not via runtime ClassCastException: a SQL call
      // with the wrong arity, a non-literal k, or a BIGINT/SMALLINT
      // literal k must fail analysis with a message, not crash
      if (children.length != 2) analysisError(
        s"graft_rolling_min_hash(text, k) takes 2 arguments, got ${children.length}")
      val kExpr = children(1)
      if (!kExpr.foldable) analysisError(
        "graft_rolling_min_hash: window size k must be a literal")
      val k: Long = kExpr.eval(null) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long    => l.longValue
        case s: java.lang.Short   => s.longValue
        case b: java.lang.Byte    => b.longValue
        case other => analysisError(
          s"graft_rolling_min_hash: window size k must be an integral literal, got $other")
      }
      if (k < 1 || k > 64) analysisError(
        s"graft_rolling_min_hash: window size $k out of range [1, 64]")
      RollingMinHash(children(0), k.toInt)
    })

  /** Register for SQL use on an existing session. */
  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(registryEntry._1, registryEntry._2, registryEntry._3)
}
