package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `quantize_int8(vec)` — symmetric per-vector int8 quantization:
 * `q_i = floor(x_i · 127/max|x| + 0.5)`, returned as
 * `struct(q: ARRAY<TINYINT>, scale: DOUBLE)` (a zero vector quantizes to
 * all zeros with scale 0).
 *
 * Native single-pass-per-phase expression replacing the HOF formulation
 * (`array_max(transform(...))` inlined into a `transform` lambda): the
 * lambda tree re-evaluated the max over d elements FOR EACH of the d
 * elements — O(d²) interpreted work plus a boxed abs-array per element —
 * on the column that is the memory headline at 100 TB. Here the max is
 * one primitive loop and the quantize another, both inside whole-stage
 * codegen: O(d) with zero boxing, same discipline as
 * [[DotProduct]]/[[CosineSimilarity]].
 *
 * Null semantics follow the native vector math ([[VectorMath]]): a NULL
 * array or a NULL element yields NULL. (The old HOF form instead let a
 * NULL element through as a NULL q slot; no caller relied on it, and
 * all-or-nothing is what the downstream similarity kernels require —
 * they return NULL on any NULL element anyway.) A non-finite element
 * (NaN/±Infinity) also yields NULL under the same all-or-nothing rule:
 * NaN would otherwise be silently excluded from the max (`NaN > mx` is
 * false) and quantize to 0, and an infinite element would collapse every
 * other coordinate's scale to 0 — both silent corruptions of the vector,
 * where NULL is an honest "this embedding is broken" signal the
 * downstream kernels already propagate.
 *
 * A vector whose max |x| is below 1e-300 quantizes as a zero vector
 * (scale 0): 127/mx would overflow to +Infinity there, and floor(x·∞)
 * cast to byte is garbage — such vectors are numerically zero at any
 * useful precision. The oracle SQL mirrors the same threshold.
 */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("scale", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorMath.checkVecs(prettyName, child.dataType)

  private lazy val elemT = VectorMath.elem(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = math.abs(VectorMath.get(a, i, elemT))
      if (x.isNaN || x.isInfinite) return null
      if (x > mx) mx = x
      i += 1
    }
    val scale = if (mx > 1e-300) 127.0 / mx else 0.0
    val q = new Array[Byte](n)
    i = 0
    while (i < n) {
      q(i) = math.floor(VectorMath.get(a, i, elemT) * scale + 0.5).toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](UnsafeArrayData.fromPrimitiveArray(q), scale))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val x = ctx.freshName("x")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val rowCls = classOf[GenericInternalRow].getName
      val arrCls = classOf[UnsafeArrayData].getName
      s"""
         |final int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = java.lang.Math.abs(${VectorMath.getterCode(a, i, child.dataType)});
         |  if (java.lang.Double.isNaN($x) || java.lang.Double.isInfinite($x)) { ${ev.isNull} = true; break; }
         |  if ($x > $mx) $mx = $x;
         |}
         |if (!${ev.isNull}) {
         |  final double $scale = $mx > 1e-300 ? 127.0 / $mx : 0.0;
         |  final byte[] $q = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $q[$i] = (byte) java.lang.Math.floor(${VectorMath.getterCode(a, i, child.dataType)} * $scale + 0.5);
         |  }
         |  ${ev.value} = new $rowCls(new Object[] { $arrCls.fromPrimitiveArray($q), $scale });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
  override def prettyName: String = "quantize_int8"
}
