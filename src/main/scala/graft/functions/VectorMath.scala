package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native vector arithmetic over embedding columns (`ARRAY<FLOAT>` /
 * `ARRAY<DOUBLE>`): dot product, L2 norm, and fused cosine similarity.
 *
 * These replace the `aggregate(zip_with(...))` higher-order-function
 * formulation on the similarity hot paths: HOF lambdas are interpreted
 * (never codegen'd) and build a boxed intermediate array per pair, so a
 * brute-force scoring loop paid three interpreted tree walks — dot plus
 * two norms — for every (query, corpus) pair. Each expression here is a
 * single primitive loop with `doGenCode`, so pair scoring stays inside
 * whole-stage codegen.
 *
 * Accumulation is in `double`, in element order, exactly like the old
 * Column formulation (`(double) a_i * (double) b_i` summed left to
 * right), so results are bit-identical to the HOF version.
 *
 * Null semantics mirror `aggregate(zip_with(...))`: a NULL array, a NULL
 * element, or mismatched lengths (zip_with pads with NULLs) yield NULL.
 */
private[graft] object VectorMath {
  // every fixed-width numeric element type the old zip_with/cast
  // formulation accepted (quantized int vectors included); Decimal is
  // excluded — no primitive accessor, and no real embedding uses it
  def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType, _) => true
    case _ => false
  }

  def checkVecs(name: String, dts: DataType*): TypeCheckResult =
    dts.find(!isVec(_)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name expects an ARRAY of a fixed-width numeric type, got $bad")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  def elem(dt: DataType): DataType = dt.asInstanceOf[ArrayType].elementType

  @inline def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
  }

  /** Java accessor snippet for one element, already widened to double. */
  def getterCode(arr: String, i: String, dt: DataType): String = elem(dt) match {
    case FloatType => s"((double) $arr.getFloat($i))"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"((double) $arr.getInt($i))"
    case LongType => s"((double) $arr.getLong($i))"
    case ShortType => s"((double) $arr.getShort($i))"
    case ByteType => s"((double) $arr.getByte($i))"
  }
}

/** `dot_product(a, b)` — Σ aᵢ·bᵢ in double precision. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorMath.checkVecs(prettyName, left.dataType, right.dataType)

  private lazy val lElem = VectorMath.elem(left.dataType)
  private lazy val rElem = VectorMath.elem(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += VectorMath.get(a, i, lElem) * VectorMath.get(b, i, rElem)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${VectorMath.getterCode(a, i, left.dataType)} * ${VectorMath.getterCode(b, i, right.dataType)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** `vector_norm(a)` — √(Σ aᵢ²). */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorMath.checkVecs(prettyName, child.dataType)

  private lazy val elemT = VectorMath.elem(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = VectorMath.get(a, i, elemT)
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = ${VectorMath.getterCode(a, i, child.dataType)};
         |  $s += $x * $x;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
  override def prettyName: String = "vector_norm"
}

/**
 * `cosine_similarity(a, b)` — Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), all three sums
 * fused into one loop. A zero-norm side yields ±Infinity/NaN exactly as
 * the unfused division does.
 */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorMath.checkVecs(prettyName, left.dataType, right.dataType)

  private lazy val lElem = VectorMath.elem(left.dataType)
  private lazy val rElem = VectorMath.elem(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = VectorMath.get(a, i, lElem)
      val y = VectorMath.get(b, i, rElem)
      sab += x * y; saa += x * x; sbb += y * y
      i += 1
    }
    java.lang.Double.valueOf(sab / (math.sqrt(saa) * math.sqrt(sbb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${VectorMath.getterCode(a, i, left.dataType)};
         |    final double $y = ${VectorMath.getterCode(b, i, right.dataType)};
         |    $sab += $x * $y; $saa += $x * $x; $sbb += $y * $y;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sab / (java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_similarity"
}

/** `vector_sub(a, b)` — element-wise a − b, widened to ARRAY<DOUBLE>.
  * The residual computation of IVFADC (x − μ_cell) runs once per CORPUS
  * row in both training and encoding, so it must be native codegen'd
  * like the other kernels — an interpreted `zip_with` lambda there
  * would re-box every element of every vector. Null semantics mirror
  * [[DotProduct]]: NULL array, NULL element, or length mismatch → NULL. */
case class VectorSub(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorMath.checkVecs(prettyName, left.dataType, right.dataType)

  private lazy val lElem = VectorMath.elem(left.dataType)
  private lazy val rElem = VectorMath.elem(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      out(i) = VectorMath.get(a, i, lElem) - VectorMath.get(b, i, rElem)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val arrCls = classOf[UnsafeArrayData].getName
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $out[$i] = ${VectorMath.getterCode(a, i, left.dataType)} - ${VectorMath.getterCode(b, i, right.dataType)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $arrCls.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorSub =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vector_sub"
}
