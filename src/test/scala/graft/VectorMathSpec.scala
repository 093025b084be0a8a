package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector math ([[graft.functions.DotProduct]] / VectorNorm /
  * CosineSimilarity): parity with the unfused HOF formulation, null and
  * length-mismatch semantics, float/double inputs, SQL surface. */
class VectorMathSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  test("dot/norm/cosine match the HOF formulation bit-for-bit on float vectors") {
    val rng = new scala.util.Random(7)
    val df = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat))
    }.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter($"a.id" < $"b.id").limit(5000)
      .select(
        call_function("cosine_similarity", $"a.v", $"b.v").as("native"),
        (call_function("dot_product", $"a.v", $"b.v") /
          (call_function("vector_norm", $"a.v") * call_function("vector_norm", $"b.v"))).as("prenorm"),
        hofCosine($"a.v", $"b.v").as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), "fused vs HOF")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), "prenorm vs HOF")
    }
  }

  test("double vectors, interpreted eval path agrees with codegen") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, -5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      call_function("dot_product", $"a", $"b"),
      call_function("vector_norm", $"a"),
      call_function("cosine_similarity", $"a", $"b")).head
    assert(r.getDouble(0) == 1.0 * 4 + 2 * -5 + 3 * 6)
    assert(r.getDouble(1) == math.sqrt(14.0))
    val expected = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getDouble(2) - expected) < 1e-15)
    // interpreted path (eval through a literal row, no codegen)
    import graft.functions.{CosineSimilarity, DotProduct, VectorNorm}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val la = Literal.create(Array(1.0, 2.0, 3.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    val lb = Literal.create(Array(4.0, -5.0, 6.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(DotProduct(la, lb).eval() == 12.0)
    assert(VectorNorm(la).eval() == math.sqrt(14.0))
    assert(math.abs(CosineSimilarity(la, lb).eval().asInstanceOf[Double] - expected) < 1e-15)
  }

  test("integer vectors (quantized embeddings) are accepted and widened to double") {
    val df = Seq((Array(1, 2, 3), Array(4L, -5L, 6L), Array(1.0f, 0.0f, 0.0f)))
      .toDF("ai", "al", "af")
    val r = df.select(
      call_function("dot_product", $"ai", $"al"),
      call_function("vector_norm", $"ai"),
      call_function("cosine_similarity", $"ai", $"af")).head
    assert(r.getDouble(0) == 12.0, "int·long dot")
    assert(r.getDouble(1) == math.sqrt(14.0), "int norm")
    assert(math.abs(r.getDouble(2) - 1.0 / math.sqrt(14.0)) < 1e-15, "int vs float cosine")
  }

  test("null array, null element, and length mismatch yield NULL (zip_with parity)") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f), Array(1.0f, 2.0f)),       // clean
      (1L, null.asInstanceOf[Array[Float]], Array(1.0f)) // null side
    ).toDF("id", "a", "b")
    val clean = df.filter($"id" === 0)
      .select(call_function("dot_product", $"a", $"b")).head
    assert(!clean.isNullAt(0))
    val nul = df.filter($"id" === 1)
      .select(call_function("dot_product", $"a", $"b")).head
    assert(nul.isNullAt(0))
    // length mismatch
    val mm = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(call_function("dot_product", $"a", $"b"),
        call_function("cosine_similarity", $"a", $"b")).head
    assert(mm.isNullAt(0) && mm.isNullAt(1))
    // null element
    val ne = spark.sql("SELECT dot_product(array(1.0D, NULL), array(1.0D, 2.0D)) d, " +
      "vector_norm(array(CAST(NULL AS DOUBLE))) n").head
    assert(ne.isNullAt(0) && ne.isNullAt(1))
  }

  test("quantize_int8: native expression — grid, zero vector, nulls, interpreted≡codegen") {
    // df path runs through whole-stage codegen; the Literal path through
    // interpreted eval — both must agree on the exact grid
    val df = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val rows = df.select($"id", graft.operators.Quantize.quantizeInt8($"v").as("qz"))
      .select($"id", $"qz.q", $"qz.scale").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getDouble(2))).toMap
    assert(rows(0L)._1 == Seq[Byte](64, -127, 32), s"grid ${rows(0L)._1}") // floor(±x·127+0.5)
    assert(rows(0L)._2 == 127.0)
    assert(rows(1L)._1 == Seq[Byte](0, 0, 0) && rows(1L)._2 == 0.0, "zero vector")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val interp = graft.functions.QuantizeInt8(
        Literal.create(Array(0.5f, -1.0f, 0.25f), ArrayType(FloatType)))
      .eval().asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(interp.getArray(0).toByteArray.toSeq == Seq[Byte](64, -127, 32))
    assert(interp.getDouble(1) == 127.0)
    // NULL array / NULL element → NULL (VectorMath semantics)
    val ne = spark.sql("SELECT quantize_int8(CAST(NULL AS ARRAY<DOUBLE>)) a, " +
      "quantize_int8(array(1.0D, CAST(NULL AS DOUBLE))) b").head
    assert(ne.isNullAt(0) && ne.isNullAt(1))
    // non-finite element → NULL (all-or-nothing, like a NULL element):
    // NaN would silently drop out of the max and quantize to 0; an
    // infinite element would zero every other coordinate's scale
    val nf = spark.sql(
      "SELECT quantize_int8(array(1.0D, CAST('NaN' AS DOUBLE))) a, " +
      "quantize_int8(array(1.0D, CAST('Infinity' AS DOUBLE))) b, " +
      "quantize_int8(array(CAST('-Infinity' AS DOUBLE), 1.0D)) c").head
    assert(nf.isNullAt(0) && nf.isNullAt(1) && nf.isNullAt(2))
    import org.apache.spark.sql.catalyst.expressions.{Literal => Lit2}
    import org.apache.spark.sql.types.{ArrayType => AT2, DoubleType => DT2}
    assert(graft.functions.QuantizeInt8(
      Lit2.create(Array(1.0, Double.NaN), AT2(DT2))).eval() == null)
    // subnormal-magnitude vector: 127/mx would overflow to +Infinity and
    // floor(x·∞) cast to byte is garbage — must quantize as a zero vector
    val sub = spark.sql("SELECT quantize_int8(array(1e-310D, -1e-310D)) q").head.getStruct(0)
    assert(sub.getSeq[Byte](0).forall(_ == 0) && sub.getDouble(1) == 0.0, s"subnormal $sub")
    // plan-shape guard: the old HOF formulation inlined
    // array_max(transform(...)) into a per-element lambda — O(d²)
    // interpreted work; the native expression must appear instead
    val plan = df.select(graft.operators.Quantize.quantizeInt8($"v"))
      .queryExecution.analyzed.toString
    assert(plan.contains("quantize_int8"), plan)
    assert(!plan.contains("array_max") && !plan.contains("transform"), plan)
  }

  test("vector_sub: values, widening, nulls, interpreted == codegen") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(0.5, 1.0, -1.0))),
      (2L, Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(0.5, 1.0))),       // length mismatch
      (3L, None, Some(Array(1.0, 2.0, 3.0)))                            // null array
    ).toDF("id", "a", "b")
    val got = df.select($"id", call_function("vector_sub", $"a", $"b").as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(1L) == Seq(0.5, 1.0, 4.0))
    assert(got(2L) == null && got(3L) == null)
    // interpreted path agrees with codegen
    import graft.functions.VectorSub
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val a = Literal.create(Array(1.0, 2.0), ArrayType(DoubleType))
    val b = Literal.create(Array(0.25, -0.25), ArrayType(DoubleType))
    val out = VectorSub(a, b).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.toDoubleArray().toSeq == Seq(0.75, 2.25))
    // null ELEMENT propagates
    val withNull = Literal.create(Seq[java.lang.Double](1.0, null), ArrayType(DoubleType, containsNull = true))
    assert(VectorSub(withNull, a).eval() == null)
  }

  test("type check rejects non-vector arguments at analysis time") {
    val err = intercept[Exception] {
      spark.sql("SELECT dot_product(array('a','b'), array('c','d'))").collect()
    }
    assert(err.getMessage.contains("ARRAY<FLOAT>") || err.getMessage.toLowerCase.contains("datatype"))
  }
}
