package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/**
 * Order-preserving DOUBLE → LONG key (the radix-sort bit trick): signed
 * comparison of the keys equals Spark's double sort order, including
 * `-0.0 < 0.0` distinctness at the bit level and NaN above `+Infinity`
 * (`doubleToLongBits` canonicalizes every NaN to 0x7FF8…, which keys
 * past 0x7FF0… = +Inf — exactly Spark's NaN-greatest ordering).
 *
 * This is the scan side of [[graft.operators.Quantiles]]' exact
 * selection: a histogram over 16-bit digits of this key replaces a
 * global sort. Codegen'd one-liner, stays inside whole-stage codegen.
 */
case class DoubleBitsOrdered(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"double_bits_ordered expects DOUBLE, got $dt")
  }
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(DoubleBits.ordered(v.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleBits.ordered($c)")
  override protected def withNewChildInternal(newChild: Expression): DoubleBitsOrdered =
    copy(newChild)
  override def prettyName: String = "double_bits_ordered"
}

object DoubleBits {
  /** key(x): positive doubles keep their bits (already ascending);
    * negative doubles flip ALL bits (reverses their descending bit
    * order AND clears the sign into the negative-long range). The
    * branch compiles to a conditional move. */
  def ordered(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0L) b else ~b ^ java.lang.Long.MIN_VALUE
  }

  /** Exact inverse of [[ordered]] (driver-side, for turning a selected
    * key back into the value it encodes). */
  def fromOrdered(key: Long): Double =
    java.lang.Double.longBitsToDouble(
      if (key >= 0L) key else ~(key ^ java.lang.Long.MIN_VALUE))
}
