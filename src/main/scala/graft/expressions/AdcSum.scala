package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the PQ asymmetric-distance (ADC)
  * inner loop: given a candidate's code array and a probe's DENSE
  * lookup table (position m·K + c stores the probe↔centroid subspace
  * distance), returns Σ_m lut[m·K + codes[m]] summed in ascending-m
  * order (the association order the oracle replays).
  *
  * Replaces the `aggregate(transform(sequence, element_at(map, …)))`
  * composition, which interpreted evaluation prices at O(M·K)
  * comparisons per pair — `element_at` on an unsorted catalyst map is
  * a LINEAR key scan, and higher-order functions never enter
  * whole-stage codegen. This is a primitive O(M) loop inside codegen
  * (measured at 10×: the probe scan dropped ~10× switching the pl_a6
  * hot path to it).
  *
  * Null semantics: null if either array is null; a null CODE element
  * and null/out-of-range LUT slots (an emptied codebook cluster that
  * no code references by construction — defensive only) make the
  * result null, matching the element_at composition this replaced.
  */
case class AdcSum(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }, right.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }) match {
    case (true, true) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_adc requires (ARRAY<INT>, ARRAY<DOUBLE>), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"
  // the result can be null even when both inputs are non-null (a
  // defensive out-of-range/null-slot hit) — and nullSafeCodeGen must
  // emit ev.isNull as a VARIABLE, not a false-constant, for the
  // generated `isNull = true` branch to compile.
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    var s = 0.0d
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null // a null code must not read slot i*k
      val idx = i * k + codes.getInt(i)
      if (idx < 0 || idx >= n || lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |final int $m = $c.numElements();
         |final int $n = $l.numElements();
         |double $acc = 0.0d;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final int $idx = $i * $k + $c.getInt($i);
         |  if ($idx < 0 || $idx >= $n || $l.isNullAt($idx)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $l.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcSum {
  /** Column-API form (used by graft.pipeline.Ann.annPq). */
  def apply(codes: Column, lut: Column, k: Int): Column =
    GraftSqlBridge.column(AdcSum(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(lut), k))
}
