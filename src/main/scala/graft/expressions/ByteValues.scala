package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Native Catalyst expression: a BINARY payload as ARRAY<INT> of its
  * unsigned byte values (0–255) — the u8-PCM "decode" for audio rows.
  *
  * Replaces the hex-string composition (`transform(sequence(...),
  * i -> conv(substr(hex(payload), 2i+1, 2), 16, 10))`) that round 9
  * shipped: per element that shape allocates a 2-char UTF8String and
  * parses it through `conv`'s string machinery — measured ~2–4 µs per
  * byte, which turned a 1.3 M-byte audio corpus into ~18 s of CPU and
  * made the byte array too expensive to reference more than once. This
  * expression is one primitive loop into an UnsafeArrayData (~ns per
  * byte) with full whole-stage codegen, so downstream higher-order
  * functions (aggregate / array_min / filter strides) stay cheap and
  * the column can be staged once and referenced freely.
  */
case class ByteValues(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_values requires BINARY, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_byte_values"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
         |final int[] $arr = new int[$b.length];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $arr[$i] = $b[$i] & 0xff;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteValues =
    copy(child = newChild)
}

object ByteValues {
  /** Column-API form (used by graft.pipeline.Multimodal). */
  def apply(payload: Column): Column =
    GraftSqlBridge.column(ByteValues(GraftSqlBridge.expression(payload)))

  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_byte_values"),
    new ExpressionInfo(classOf[ByteValues].getName, "graft_byte_values"),
    (children: Seq[Expression]) => {
      if (children.length != 1)
        throw new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_3100",
          Map("message" ->
            s"graft_byte_values(payload) takes 1 argument, got ${children.length}"))
      ByteValues(children.head)
    })

  /** Register `graft_byte_values` for SQL use on an existing session. */
  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(registryEntry._1, registryEntry._2, registryEntry._3)
}
