package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Product-quantization (PQ) kernels — the classic IVFADC building blocks
 * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
 * Search", TPAMI 2011 — public method): a d-dim vector is split into `m`
 * subvectors of `d/m` dims, each encoded as the id of its nearest
 * codeword among `ksub` per-subspace centroids. The corpus then stores
 * `m` BYTES per vector instead of `d` floats (32× at d=64, m=8 vs
 * float32) and pair scoring against a query costs `m` table lookups
 * instead of a d-element dot product — the memory/bandwidth lever that
 * makes billion-vector ANN feasible at 100 TB.
 *
 * Three native codegen'd expressions (the hot-path discipline of
 * [[VectorMath]] — no interpreted HOF lambdas, no boxing):
 *
 *  - `pq_encode(vec, cb, m, ksub)` — corpus pass, O(ksub·d) per vector
 *  - `pq_lut(vec, cb, m, ksub)` — query-side lookup table of
 *    sub-dot-products, O(ksub·d) per QUERY (amortized over the corpus)
 *  - `pq_adc_dot(lut, codes)` — per-PAIR asymmetric-distance score,
 *    O(m): Σⱼ lut[j·ksub + codes[j]]
 *
 * The codebook `cb` is a flat ARRAY<DOUBLE> of length m·ksub·dsub laid
 * out codeword-major: cb[(j·ksub + k)·dsub + t] is element t of codeword
 * k of subspace j. The expressions take it as a plain child expression —
 * a `typedLit` works for exploratory SQL, but the operator layer ships
 * it as 1-ROW BROADCAST DATA ([[graft.operators.Pq]]): a multi-KB
 * literal is re-hashed by every Catalyst transform, duplicated into
 * pushed-down scan filters and both sides of self-joins, and serialized
 * into every task binary; an attribute read from a broadcast row costs
 * none of that.
 *
 * Null semantics mirror [[VectorMath]]: NULL array / NULL element —
 * on EITHER side, vector/codebook/lut — or a vector length not
 * divisible into the codebook's geometry → NULL. `pq_encode`/`pq_lut`
 * additionally treat a NaN/±Inf VECTOR element as NULL: a NaN distance
 * makes every `d2 < best` comparison false, so without the guard such
 * rows would silently encode to all-zero codes and surface as ordinary
 * search/near-dup candidates instead of propagating NULL. The check is
 * one O(d) pass per row, hoisted OUT of the O(ksub·d) codeword loop
 * (where the element null check used to sit — the guard is net cheaper,
 * not dearer). The element-level checks on the codebook/lut side are
 * emitted only when the incoming array type admits nulls
 * (`containsNull`); the production path (a broadcast-data codebook, a
 * `pq_lut`-produced lut — both `containsNull = false`) pays nothing for
 * them.
 * `ksub ≤ 128` for byte codes (`pq_encode`); the SMALLINT variant
 * `pq_encode_s` lifts the coarse-quantizer bound to `ksub ≤ 32768`.
 */
private[graft] object PqMath {
  def checkGeom(name: String, m: Int, ksub: Int, maxKsub: Int = 128): TypeCheckResult =
    if (m <= 0 || ksub <= 0 || ksub > maxKsub)
      TypeCheckResult.TypeCheckFailure(s"$name needs m > 0 and 0 < ksub <= $maxKsub, got m=$m ksub=$ksub")
    else TypeCheckResult.TypeCheckSuccess
}

/** `pq_encode(vec, cb, m, ksub)` → ARRAY<TINYINT> of length m: per
  * subspace, the id of the nearest (squared-L2) codeword. Ties go to the
  * LOWEST codeword id (strict `<` on the running best) — load-bearing
  * for bit-deterministic codes.
  *
  * `wide = true` is the SQL function `pq_encode_s`: identical argmin,
  * ARRAY<SMALLINT> output, ksub ≤ 32768 — the coarse-quantizer variant
  * ([[graft.operators.Similarity]] cell assignment with m = 1), where
  * real corpora need cells ∝ corpus size and 128 byte-codes is a scale
  * cap. Fine-grained PQ codes stay bytes: at m·2 bytes/vector the wide
  * form would double the encoded corpus for recall ADC can't use. */
case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int,
                    wide: Boolean = false)
    extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(if (wide) ShortType else ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val g = PqMath.checkGeom(prettyName, m, ksub, if (wide) 32768 else 128)
    if (g.isFailure) g else VectorMath.checkVecs(prettyName, left.dataType, right.dataType)
  }

  private lazy val vElem = VectorMath.elem(left.dataType)
  private lazy val cElem = VectorMath.elem(right.dataType)
  private lazy val cbMayHaveNulls = right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cb = r.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n % m != 0 || cb.numElements() != m * ksub * (n / m)) return null
    var i = 0
    while (i < n) { // one O(d) pass: NULL or non-finite element -> NULL
      if (v.isNullAt(i)) return null
      val xv = VectorMath.get(v, i, vElem)
      if (java.lang.Double.isNaN(xv) || java.lang.Double.isInfinite(xv)) return null
      i += 1
    }
    val dsub = n / m
    val outB = if (wide) null else new Array[Byte](m)
    val outS = if (wide) new Array[Short](m) else null
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < ksub) {
        var d2 = 0.0
        var t = 0
        while (t < dsub) {
          if (cbMayHaveNulls && cb.isNullAt((j * ksub + k) * dsub + t)) return null
          val x = VectorMath.get(v, j * dsub + t, vElem) -
            VectorMath.get(cb, (j * ksub + k) * dsub + t, cElem)
          d2 += x * x
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = k }
        k += 1
      }
      if (wide) outS(j) = best.toShort else outB(j) = best.toByte
      j += 1
    }
    if (wide) UnsafeArrayData.fromPrimitiveArray(outS)
    else UnsafeArrayData.fromPrimitiveArray(outB)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val n = ctx.freshName("n"); val dsub = ctx.freshName("dsub")
      val j = ctx.freshName("j"); val k = ctx.freshName("k"); val t = ctx.freshName("t")
      val d2 = ctx.freshName("d2"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val out = ctx.freshName("out"); val outer = ctx.freshName("outer")
      val arrCls = classOf[UnsafeArrayData].getName
      val cbNullCheck = if (cbMayHaveNulls)
        s"if ($cb.isNullAt(($j * $ksub + $k) * $dsub + $t)) { ${ev.isNull} = true; break $outer; }"
      else ""
      val (elemTy, castTy) = if (wide) ("short", "(short)") else ("byte", "(byte)")
      val i0 = ctx.freshName("i0"); val xv = ctx.freshName("xv")
      s"""
         |final int $n = $v.numElements();
         |if ($n % $m != 0 || $cb.numElements() != $m * $ksub * ($n / $m)) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i0 = 0; $i0 < $n; $i0++) {
         |    if ($v.isNullAt($i0)) { ${ev.isNull} = true; break; }
         |    final double $xv = ${VectorMath.getterCode(v, i0, left.dataType)};
         |    if (Double.isNaN($xv) || Double.isInfinite($xv)) { ${ev.isNull} = true; break; }
         |  }
         |  final int $dsub = $n / $m;
         |  final $elemTy[] $out = new $elemTy[$m];
         |  if (!${ev.isNull}) {
         |  $outer:
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $k = 0; $k < $ksub; $k++) {
         |      double $d2 = 0.0;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $cbNullCheck
         |        final double $x = ${VectorMath.getterCode(v, s"$j * $dsub + $t", left.dataType)} -
         |          ${VectorMath.getterCode(cb, s"($j * $ksub + $k) * $dsub + $t", right.dataType)};
         |        $d2 += $x * $x;
         |      }
         |      if ($d2 < $bestD) { $bestD = $d2; $best = $k; }
         |    }
         |    $out[$j] = $castTy $best;
         |  }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $arrCls.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = if (wide) "pq_encode_s" else "pq_encode"
}

/** `pq_lut(vec, cb, m, ksub)` → ARRAY<DOUBLE> of length m·ksub:
  * lut[j·ksub + k] = ⟨vec subvector j, codeword k of subspace j⟩. One
  * per query row; every corpus pair then scores in O(m) via
  * [[PqAdcDot]]. No code-width constraint on this side, so ksub goes to
  * 32768 — the coarse-probe path (m = 1, ksub = nCentroids) needs it
  * past 128 cells; at 32k cells the per-query LUT is 256 KB, amortized
  * over the whole probed corpus. */
case class PqLut(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val g = PqMath.checkGeom(prettyName, m, ksub, maxKsub = 32768)
    if (g.isFailure) g else VectorMath.checkVecs(prettyName, left.dataType, right.dataType)
  }

  private lazy val vElem = VectorMath.elem(left.dataType)
  private lazy val cElem = VectorMath.elem(right.dataType)
  private lazy val cbMayHaveNulls = right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cb = r.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n % m != 0 || cb.numElements() != m * ksub * (n / m)) return null
    var i = 0
    while (i < n) { // one O(d) pass: NULL or non-finite element -> NULL
      if (v.isNullAt(i)) return null
      val xv = VectorMath.get(v, i, vElem)
      if (java.lang.Double.isNaN(xv) || java.lang.Double.isInfinite(xv)) return null
      i += 1
    }
    val dsub = n / m
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var k = 0
      while (k < ksub) {
        var s = 0.0
        var t = 0
        while (t < dsub) {
          if (cbMayHaveNulls && cb.isNullAt((j * ksub + k) * dsub + t)) return null
          s += VectorMath.get(v, j * dsub + t, vElem) *
            VectorMath.get(cb, (j * ksub + k) * dsub + t, cElem)
          t += 1
        }
        out(j * ksub + k) = s
        k += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val n = ctx.freshName("n"); val dsub = ctx.freshName("dsub")
      val j = ctx.freshName("j"); val k = ctx.freshName("k"); val t = ctx.freshName("t")
      val s = ctx.freshName("s"); val out = ctx.freshName("out")
      val outer = ctx.freshName("outer")
      val arrCls = classOf[UnsafeArrayData].getName
      val cbNullCheck = if (cbMayHaveNulls)
        s"if ($cb.isNullAt(($j * $ksub + $k) * $dsub + $t)) { ${ev.isNull} = true; break $outer; }"
      else ""
      val i0 = ctx.freshName("i0"); val xv = ctx.freshName("xv")
      s"""
         |final int $n = $v.numElements();
         |if ($n % $m != 0 || $cb.numElements() != $m * $ksub * ($n / $m)) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i0 = 0; $i0 < $n; $i0++) {
         |    if ($v.isNullAt($i0)) { ${ev.isNull} = true; break; }
         |    final double $xv = ${VectorMath.getterCode(v, i0, left.dataType)};
         |    if (Double.isNaN($xv) || Double.isInfinite($xv)) { ${ev.isNull} = true; break; }
         |  }
         |  final int $dsub = $n / $m;
         |  final double[] $out = new double[$m * $ksub];
         |  if (!${ev.isNull}) {
         |  $outer:
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $k = 0; $k < $ksub; $k++) {
         |      double $s = 0.0;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $cbNullCheck
         |        $s += ${VectorMath.getterCode(v, s"$j * $dsub + $t", left.dataType)} *
         |          ${VectorMath.getterCode(cb, s"($j * $ksub + $k) * $dsub + $t", right.dataType)};
         |      }
         |      $out[$j * $ksub + $k] = $s;
         |    }
         |  }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $arrCls.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqLut =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_lut"
}

/** `pq_adc_dot(lut, codes)` — the per-pair hot path: Σⱼ lut[j·ksub +
  * codes[j]] with ksub = lut.length / codes.length. Codes are either
  * ARRAY<TINYINT> (what `pq_encode` emits) or BINARY (the most compact
  * parquet storage of an m-byte code — no per-element rep/def levels).
  * Codes outside [0, ksub) or a lut length not divisible by the code
  * count → NULL. */
case class PqAdcDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def codesIsBinary: Boolean = right.dataType == BinaryType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!VectorMath.isVec(left.dataType) ||
        VectorMath.elem(left.dataType) != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects lut: ARRAY<DOUBLE>, got ${left.dataType}")
    else if (!codesIsBinary &&
             right.dataType != ArrayType(ByteType, containsNull = false) &&
             right.dataType != ArrayType(ByteType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects codes: ARRAY<TINYINT> or BINARY, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val lutMayHaveNulls = left.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val (m, codeAt): (Int, Int => Int) =
      if (codesIsBinary) { val b = r.asInstanceOf[Array[Byte]]; (b.length, i => b(i).toInt) }
      else {
        val a = r.asInstanceOf[ArrayData]
        (a.numElements(), { i: Int => if (a.isNullAt(i)) Int.MinValue else a.getByte(i).toInt })
      }
    if (m == 0 || lut.numElements() % m != 0) return null
    val ksub = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val k = codeAt(j)
      if (k < 0 || k >= ksub) return null
      if (lutMayHaveNulls && lut.isNullAt(j * ksub + k)) return null
      s += lut.getDouble(j * ksub + k)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m"); val ksub = ctx.freshName("ksub")
      val j = ctx.freshName("j"); val k = ctx.freshName("k"); val s = ctx.freshName("s")
      val (lenCode, nullCheck, getCode) =
        if (codesIsBinary) (s"$codes.length", "false", (i: String) => s"(int) $codes[$i]")
        else (s"$codes.numElements()", s"$codes.isNullAt($j)", (i: String) => s"(int) $codes.getByte($i)")
      val lutNullCheck = if (lutMayHaveNulls)
        s"if ($lut.isNullAt($j * $ksub + $k)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |final int $m = $lenCode;
         |if ($m == 0 || $lut.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $ksub = $lut.numElements() / $m;
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($nullCheck) { ${ev.isNull} = true; break; }
         |    final int $k = ${getCode(j)};
         |    if ($k < 0 || $k >= $ksub) { ${ev.isNull} = true; break; }
         |    $lutNullCheck
         |    $s += $lut.getDouble($j * $ksub + $k);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc_dot"
}

/** `pq_sdc_dot(table, codesA, codesB)` — symmetric distance computation
  * (Jégou TPAMI 2011 §III): the pair score between TWO ENCODED vectors,
  * Σⱼ table[(j·ksub + aⱼ)·ksub + bⱼ], where table is the m·ksub²
  * codeword-dot table ((j·ksub+ka)·ksub+kb ↦ ⟨cwⱼₖₐ, cwⱼₖᵦ⟩,
  * [[graft.operators.Pq.PqCodebook.sdcTable]]). Equals
  * dot(reconstruction(A), reconstruction(B)) exactly, in O(m) lookups —
  * pair scoring that never touches float vectors, the shape of
  * encoded-corpus near-dup detection. Codes are ARRAY<TINYINT> or
  * BINARY on either side independently; geometry mismatch, codes out of
  * [0, ksub), or (when the array type admits them) NULL elements → NULL.
  *
  * Geometry: `pq_sdc_dot(table, a, b, m, ksub)` pins m/ksub explicitly —
  * the operator layer always has the codebook in hand, and an explicit
  * ksub turns a wrong-geometry table into NULL instead of silently wrong
  * scores. The 3-arg form infers ksub = √(table.len/m) for exploratory
  * SQL; it accepts any table whose length happens to make that a perfect
  * square, so pinned geometry is the production form. */
case class PqSdcDot(first: Expression, second: Expression, third: Expression,
                    geomM: Int = -1, geomKsub: Int = -1)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def isCodes(dt: DataType): Boolean =
    dt == BinaryType || dt == ArrayType(ByteType, containsNull = false) ||
      dt == ArrayType(ByteType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorMath.isVec(first.dataType) ||
        VectorMath.elem(first.dataType) != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects table: ARRAY<DOUBLE>, got ${first.dataType}")
    else if (!isCodes(second.dataType) || !isCodes(third.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects codes: ARRAY<TINYINT> or BINARY, got ${second.dataType}, ${third.dataType}")
    else if (geomKsub != -1 || geomM != -1) PqMath.checkGeom(prettyName, geomM, geomKsub)
    else TypeCheckResult.TypeCheckSuccess

  private lazy val tableMayHaveNulls = first.dataType.asInstanceOf[ArrayType].containsNull

  private def codeAt(v: Any, dt: DataType): (Int, Int => Int) = dt match {
    case BinaryType =>
      val b = v.asInstanceOf[Array[Byte]]; (b.length, i => b(i).toInt)
    case _ =>
      val a = v.asInstanceOf[ArrayData]
      (a.numElements(), { i: Int => if (a.isNullAt(i)) Int.MinValue else a.getByte(i).toInt })
  }

  override def nullSafeEval(t: Any, l: Any, r: Any): Any = {
    val table = t.asInstanceOf[ArrayData]
    val (m, aAt) = codeAt(l, second.dataType)
    val (mb, bAt) = codeAt(r, third.dataType)
    if (m == 0 || m != mb || table.numElements() % m != 0) return null
    if (geomKsub > 0 &&
        (m != geomM || table.numElements() != geomM * geomKsub * geomKsub)) return null
    val k2 = table.numElements() / m
    val ksub =
      if (geomKsub > 0) geomKsub
      else math.sqrt(k2.toDouble).toInt
    if (ksub * ksub != k2) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      val ka = aAt(j); val kb = bAt(j)
      if (ka < 0 || ka >= ksub || kb < 0 || kb >= ksub) return null
      val idx = (j * ksub + ka) * ksub + kb
      if (tableMayHaveNulls && table.isNullAt(idx)) return null
      s += table.getDouble(idx)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (table, ca, cb2) => {
      val m = ctx.freshName("m"); val mb = ctx.freshName("mb")
      val k2 = ctx.freshName("k2"); val ksub = ctx.freshName("ksub")
      val j = ctx.freshName("j"); val ka = ctx.freshName("ka"); val kb = ctx.freshName("kb")
      val idx = ctx.freshName("idx"); val s = ctx.freshName("s")
      def lenOf(v: String, dt: DataType) =
        if (dt == BinaryType) s"$v.length" else s"$v.numElements()"
      def nullAt(v: String, dt: DataType, i: String) =
        if (dt == BinaryType) "false" else s"$v.isNullAt($i)"
      def getAt(v: String, dt: DataType, i: String) =
        if (dt == BinaryType) s"(int) $v[$i]" else s"(int) $v.getByte($i)"
      val tableNullCheck = if (tableMayHaveNulls)
        s"if ($table.isNullAt($idx)) { ${ev.isNull} = true; break; }"
      else ""
      val geomCheck = if (geomKsub > 0)
        s" || $m != $geomM || $table.numElements() != ${geomM * geomKsub * geomKsub}"
      else ""
      val ksubExpr = if (geomKsub > 0) s"$geomKsub"
      else s"(int) java.lang.Math.sqrt((double) $k2)"
      s"""
         |final int $m = ${lenOf(ca, second.dataType)};
         |final int $mb = ${lenOf(cb2, third.dataType)};
         |if ($m == 0 || $m != $mb || $table.numElements() % $m != 0$geomCheck) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $k2 = $table.numElements() / $m;
         |  final int $ksub = $ksubExpr;
         |  if ($ksub * $ksub != $k2) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $m; $j++) {
         |      if (${nullAt(ca, second.dataType, j)} || ${nullAt(cb2, third.dataType, j)}) { ${ev.isNull} = true; break; }
         |      final int $ka = ${getAt(ca, second.dataType, j)};
         |      final int $kb = ${getAt(cb2, third.dataType, j)};
         |      if ($ka < 0 || $ka >= $ksub || $kb < 0 || $kb >= $ksub) { ${ev.isNull} = true; break; }
         |      final int $idx = ($j * $ksub + $ka) * $ksub + $kb;
         |      $tableNullCheck
         |      $s += $table.getDouble($idx);
         |    }
         |    if (!${ev.isNull}) ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression, newThird: Expression): PqSdcDot =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "pq_sdc_dot"
}
