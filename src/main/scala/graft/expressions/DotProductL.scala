package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: integer dot product of two BIGINT arrays
  * with full whole-stage codegen (`doGenCode` emits a primitive loop
  * over `ArrayData` — no zipped-struct allocation, unlike the
  * `aggregate(zip_with(...))` composition it replaces in the ANN hot
  * loop). The brief's extension-path (b): a scalar kernel the built-in
  * higher-order functions express only with per-row allocations.
  *
  * Null semantics: null if either array is null (BinaryExpression
  * default); length mismatch takes the common prefix (candidate arrays
  * are schema-enforced equal-length).
  */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<BIGINT> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)
}

object DotProductL {
  /** Column-API form (used by graft.pipeline.Ann). */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductL(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductL].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_3100",
          Map("message" -> s"graft_dot(a, b) takes 2 arguments, got ${children.length}"))
      DotProductL(children(0), children(1))
    })

  /** Register `graft_dot` for SQL use on an existing session. */
  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(registryEntry._1, registryEntry._2, registryEntry._3)
}

/** SparkSessionExtensions hook: enable with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * to get `SELECT graft_dot(a, b)` in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(DotProductL.registryEntry)
    ext.injectFunction(RollingMinHash.registryEntry)
    ext.injectFunction(TokenGramHash.registryEntry)
    ext.injectFunction(ByteValues.registryEntry)
  }
}
