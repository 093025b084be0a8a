package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization ([[graft.operators.Pq]] + the native
  * pq_encode/pq_lut/pq_adc_dot kernels): encode correctness against a
  * hand argmin, ADC ≡ dot-of-reconstruction, null/geometry semantics,
  * interpreted ≡ codegen, training determinism, and recall sanity on
  * clustered data. */
class PqSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  private def mkVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
  }

  test("pq_encode matches a driver-side argmin on a hand-built codebook") {
    // m=2, ksub=2, dsub=2: codebook laid out (j·ksub+k)·dsub+t
    val cb = Array(0.0, 0.0, 10.0, 10.0, /* subspace 1 */ -5.0, 0.0, 5.0, 0.0)
    val df = Seq(
      (1L, Array(9.0f, 9.0f, 4.0f, 0.0f)),   // → codes [1, 1]
      (2L, Array(1.0f, -1.0f, -4.0f, 1.0f))  // → codes [0, 0]
    ).toDF("id", "v")
    val got = df.select($"id",
      call_function("pq_encode", $"v", typedLit(cb.toSeq), lit(2), lit(2)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(got(1L) == Seq(1.toByte, 1.toByte))
    assert(got(2L) == Seq(0.toByte, 0.toByte))
  }

  test("adc(lut, codes) equals dot(query, reconstruction) exactly") {
    val corpus = mkVecs(80, 16, seed = 11).toDF("id", "v")
    val cb = Pq.train(corpus, "id", "v", dim = 16, m = 4, ksub = 8, iters = 2)
    val codes = Pq.encodeCorpus(corpus, "id", "v", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    val queries = mkVecs(5, 16, seed = 12)
    val lutRows = queries.toDF("id", "v")
      .select($"id", Pq.lut($"v", cb).as("lut")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for ((qid, qv) <- queries; (cid, code) <- codes) {
      val recon = cb.decode(code)
      val direct = qv.indices.map(i => qv(i).toDouble * recon(i)).sum
      // ADC sums dsub-sized sub-dots in subspace order; association
      // differs from the flat left-to-right sum, so exact to 1e-12 only
      val viaLut = {
        val lut = lutRows(qid)
        code.indices.map(j => lut(j * cb.ksub + code(j))).sum
      }
      assert(math.abs(direct - viaLut) < 1e-12, s"q=$qid c=$cid")
    }
  }

  test("operator plans ship codebooks as broadcast handles, never literals") {
    val corpus = mkVecs(100, 16, seed = 21).toDF("id", "v")
    val cb = Pq.train(corpus, "id", "v", dim = 16, m = 4, ksub = 8, iters = 1)
    val enc = Pq.encodeCorpus(corpus, "id", "v", cb)
    val plan = enc.queryExecution.analyzed.toString
    assert(plan.contains("broadcast_array"), s"codebook must ride a broadcast handle:\n$plan")
    assert(plan.length < 10000, s"plan must be literal-free, got ${plan.length} chars")
    // and the handle-backed encode must agree with the literal-backed one
    val viaLit = corpus.select($"id", Pq.encode($"v", cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    enc.collect().foreach(r => assert(r.getSeq[Byte](1) == viaLit(r.getLong(0))))
  }

  test("pq_encode_s: SMALLINT codes, identical argmin past the byte bound") {
    // 200 DISTINCT seeded-Gaussian codewords over dim 4 (m=1) — byte
    // codes cannot represent ids > 127, and with distinct codewords the
    // argmin spreads across the whole id range (a modular formula here
    // would repeat codewords, and the lowest-id tie-break would then
    // never pick a wide id)
    val cbRng = new scala.util.Random(7)
    val cbArr = Array.fill(200 * 4)(cbRng.nextGaussian())
    val df = mkVecs(50, 4, seed = 31).toDF("id", "v")
    val got = df.select($"id",
      call_function("pq_encode_s", $"v", typedLit(cbArr.toSeq), lit(1), lit(200)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Short](1).head).toMap
    val vecs = mkVecs(50, 4, seed = 31).toMap
    for ((id, code) <- got) {
      val v = vecs(id)
      val best = (0 until 200).minBy { k =>
        (0 until 4).map(t => math.pow(v(t) - cbArr(k * 4 + t), 2)).sum
      }
      assert(code == best, s"id=$id: wide kernel $code vs driver argmin $best")
      assert(code > Byte.MaxValue || code >= 0) // exercises ids beyond a byte somewhere
    }
    assert(got.values.exists(_ > 127), "test data should hit codewords past the byte bound")
  }

  test("NaN/Inf vector elements -> NULL codes and NULL lut (null-in -> null-out)") {
    val cb = typedLit((0 until 16).map(_.toDouble)) // m=2, ksub=2, dsub=4 over dim 8
    val df = Seq(
      (1L, Array.tabulate(8)(_.toFloat)),
      (2L, Array.tabulate(8)(i => if (i == 3) Float.NaN else i.toFloat)),
      (3L, Array.tabulate(8)(i => if (i == 5) Float.PositiveInfinity else i.toFloat))
    ).toDF("id", "v")
    val got = df.select($"id",
      call_function("pq_encode", $"v", cb, lit(2), lit(2)).as("c"),
      call_function("pq_lut", $"v", cb, lit(2), lit(2)).as("l")).collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(got(1L) == ((false, false)))
    assert(got(2L) == ((true, true)), "NaN element must propagate NULL")
    assert(got(3L) == ((true, true)), "Inf element must propagate NULL")
  }

  test("geometry/null semantics: bad length, null element, bad code -> NULL") {
    val cb = typedLit((0 until 16).map(_.toDouble))   // m=2, ksub=2, dsub=4 over dim 8
    val df = Seq(
      (1L, Some(Array.tabulate(8)(_.toFloat))),       // valid
      (2L, Some(Array.tabulate(6)(_.toFloat))),       // 6 % 2 == 0 but cb length mismatch
      (3L, None)                                      // null vector
    ).toDF("id", "v")
    val got = df.select($"id",
      call_function("pq_encode", $"v", cb, lit(2), lit(2)).as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Byte](1))).toMap
    assert(got(1L) != null && got(1L).size == 2)
    assert(got(2L) == null)
    assert(got(3L) == null)
    // adc: code out of range → NULL (BINARY codes — the compact storage form)
    val bad = Seq((Array(1.0, 2.0, 3.0, 4.0), Array(5.toByte))).toDF("lut", "codes")
    assert(bad.select(call_function("pq_adc_dot", $"lut", $"codes")).head.isNullAt(0))
    val ok = Seq((Array(1.0, 2.0, 3.0, 4.0), Array(1.toByte, 0.toByte))).toDF("lut", "codes")
    assert(ok.select(call_function("pq_adc_dot", $"lut", $"codes")).head.getDouble(0) == 2.0 + 3.0)
    // same scores via ARRAY<TINYINT> codes (what pq_encode emits)
    val okArr = Seq((Array(1.0, 2.0, 3.0, 4.0), Seq(1.toByte, 0.toByte))).toDF("lut", "codes")
    assert(okArr.select(call_function("pq_adc_dot", $"lut", $"codes")).head.getDouble(0) == 2.0 + 3.0)
  }

  test("interpreted eval agrees with codegen") {
    import graft.functions.{PqAdcDot, PqEncode, PqLut}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    def arr(xs: Array[Double]) = Literal.create(xs, ArrayType(DoubleType))
    val cb = arr(Array(0.0, 0.0, 10.0, 10.0, -5.0, 0.0, 5.0, 0.0))
    val v = arr(Array(9.0, 9.0, 4.0, 0.0))
    val codes = PqEncode(v, cb, 2, 2).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(codes.toByteArray().toSeq == Seq(1.toByte, 1.toByte))
    val lut = PqLut(v, cb, 2, 2).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // lut[j*ksub+k] = sub-dot: [0, 180, -20, 20]
    assert(lut.toDoubleArray().toSeq == Seq(0.0, 180.0, -20.0, 20.0))
    val cl = Literal.create(Array(1.toByte, 0.toByte), BinaryType)
    assert(PqAdcDot(Literal.create(lut.toDoubleArray(), ArrayType(DoubleType)), cl)
      .eval() == 180.0 + -20.0)
    val clArr = Literal.create(Seq(1.toByte, 0.toByte), ArrayType(ByteType, containsNull = false))
    assert(PqAdcDot(Literal.create(lut.toDoubleArray(), ArrayType(DoubleType)), clArr)
      .eval() == 180.0 + -20.0)
  }

  test("null semantics on the codebook/lut side (containsNull arrays)") {
    import org.apache.spark.sql.types._
    // codebook with a NULL element → NULL codes / NULL lut (not read-as-0)
    val cbNull: Seq[java.lang.Double] = Seq[java.lang.Double](
      0.0, 0.0, null, 10.0, -5.0, 0.0, 5.0, 0.0)
    val df = Seq((1L, Array(9.0f, 9.0f, 4.0f, 0.0f))).toDF("id", "v")
      .withColumn("cb", typedLit(cbNull))
    assert(df.select(call_function("pq_encode", $"v", $"cb", lit(2), lit(2))).head.isNullAt(0))
    assert(df.select(call_function("pq_lut", $"v", $"cb", lit(2), lit(2))).head.isNullAt(0))
    // lut with a NULL element AT A LOOKED-UP slot → NULL adc
    val lutNull: Seq[java.lang.Double] = Seq[java.lang.Double](1.0, null, 3.0, 4.0)
    val bad = Seq(Tuple1(Array(1.toByte, 0.toByte))).toDF("codes")
      .withColumn("lut", typedLit(lutNull))
    assert(bad.select(call_function("pq_adc_dot", $"lut", $"codes")).head.isNullAt(0))
    // a NULL at a slot the codes never touch is fine (codes hit 0 and 2)
    val ok = Seq(Tuple1(Array(0.toByte, 0.toByte))).toDF("codes")
      .withColumn("lut", typedLit(lutNull))
    assert(ok.select(call_function("pq_adc_dot", $"lut", $"codes")).head.getDouble(0) == 1.0 + 3.0)
  }

  test("zero-reconstruction-norm corpus row gets NULL cos and sorts last, not first") {
    // codeword 0 of both subspaces is the zero vector: the all-zero
    // corpus row encodes to [0,0], its reconstruction norm is EXACTLY 0,
    // and cos = 0/0 — NaN pre-fix, which Spark ranks above every real
    // double and would put the degenerate row at rank 1
    val cb = Pq.PqCodebook(m = 2, ksub = 2, dsub = 2,
      flat = Array(0.0, 0.0, 1.0, 1.0, /* subspace 1 */ 0.0, 0.0, 1.0, 1.0))
    val df = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 0.9f, 1.1f)),
      (9L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val top = Pq.topK(df.filter($"id" === 1L), df, "id", "v", "id", "v", k = 2, cb)
      .collect().sortBy(r => r.getInt(3))
    assert(top.head.getLong(1) == 2L, s"real neighbor must rank first, got ${top.toSeq}")
    assert(top.forall(r => r.isNullAt(2) || !r.getDouble(2).isNaN), "cos must never be NaN")
    assert(top.last.getLong(1) == 9L && top.last.isNullAt(2),
      "degenerate row sorts last with NULL cos")
  }

  test("NaN query vector yields NULL cos everywhere, never NaN (which would rank first)") {
    val corpus = mkVecs(20, 8, seed = 121).toDF("id", "v")
    val cb = Pq.train(corpus, "id", "v", dim = 8, m = 2, ksub = 4, iters = 1)
    val nanQ = Seq((500L, Array.tabulate(8)(i => if (i == 2) Float.NaN else 1.0f)))
      .toDF("id", "v")
    val got = Pq.topK(nanQ, corpus, "id", "v", "id", "v", k = 3, cb).collect()
    assert(got.forall(r => r.isNullAt(2)), s"NaN query must produce NULL cos: ${got.toSeq}")
  }

  test("train ignores rows with NULL/NaN/Inf elements instead of poisoning the codebook") {
    val clean = mkVecs(100, 16, seed = 51)
    val poisoned = clean ++ Seq(
      (900L, Array.tabulate(16)(i => if (i == 3) Float.NaN else 1.0f)),
      (901L, Array.tabulate(16)(i => if (i == 5) Float.PositiveInfinity else 1.0f)))
    val cbClean = Pq.train(clean.toDF("id", "v"), "id", "v", dim = 16, m = 4, ksub = 8, iters = 2)
    val cbPois = Pq.train(poisoned.toDF("id", "v"), "id", "v", dim = 16, m = 4, ksub = 8, iters = 2)
    assert(cbPois.flat.forall(x => !x.isNaN && !x.isInfinite))
    // non-finite rows are filtered from both the sample and the Lloyd
    // cell sums, so the codebook is IDENTICAL to training without them
    assert(cbClean.flat.toSeq == cbPois.flat.toSeq)
  }

  test("training is deterministic and refinement does not worsen distortion") {
    val corpus = mkVecs(200, 16, seed = 21).toDF("id", "v").cache()
    val cb1 = Pq.train(corpus, "id", "v", dim = 16, m = 4, ksub = 8, iters = 2)
    val cb2 = Pq.train(corpus.repartition(7), "id", "v", dim = 16, m = 4, ksub = 8, iters = 2)
    assert(cb1.flat.toSeq == cb2.flat.toSeq, "codebooks must not depend on partitioning")
    // distortion = mean squared reconstruction error, must not increase
    // with refinement (k-means monotonicity, up to the fixed-point grid)
    def distortion(cb: Pq.PqCodebook): Double = {
      val codes = Pq.encodeCorpus(corpus, "id", "v", cb).collect()
        .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
      val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      vecs.map { case (id, v) =>
        val rec = cb.decode(codes(id))
        v.indices.map(i => { val d = v(i) - rec(i); d * d }).sum
      }.sum / vecs.size
    }
    val d0 = distortion(Pq.train(corpus, "id", "v", dim = 16, m = 4, ksub = 8, iters = 0))
    val d2 = distortion(cb1)
    assert(d2 <= d0 + 1e-9, s"refined distortion $d2 should not exceed unrefined $d0")
    corpus.unpersist()
  }

  test("topK recall on clustered data; encoded-corpus path identical") {
    // 8 well-separated cluster centers, 25 points each: PQ must place
    // same-cluster points together, so top-k recall vs brute force is high
    val rng = new scala.util.Random(31)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian() * 10))
    val data = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat))
    }
    val df = data.toDF("id", "v").cache()
    val cb = Pq.train(df, "id", "v", dim = 16, m = 4, ksub = 16, iters = 2)
    val queries = df.filter($"id" < 20)
    val pq = Pq.topK(queries, df, "id", "v", "id", "v", k = 5, cb)
      .select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same-cluster points share (near-)identical codes, so WITHIN-cluster
    // order collapses to ties — inherent to PQ. The semantic property is
    // cluster-level: every retrieved neighbor comes from the query's
    // cluster (cluster id = id % 8 by construction).
    val sameCluster = pq.count { case (q, c) => q % 8 == c % 8 }
    assert(sameCluster.toDouble / pq.size >= 0.95,
      s"cluster precision ${sameCluster.toDouble / pq.size}")
    // persist-once path: encode then search the codes — identical output
    val codesDf = Pq.encodeCorpus(df, "id", "v", cb)
    val pq2 = Pq.topKEncoded(queries, codesDf, "id", "v", "id", "codes", k = 5, cb)
      .select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq2 == pq, "topKEncoded must equal topK on the same codebook")
    df.unpersist()
  }

  test("codes survive a parquet round-trip (ARRAY<TINYINT> and BINARY) and search identically") {
    val corpus = mkVecs(60, 16, seed = 71).toDF("id", "v")
    val cb = Pq.train(corpus, "id", "v", dim = 16, m = 4, ksub = 8, iters = 1)
    val codes = Pq.encodeCorpus(corpus, "id", "v", cb)
    val dir = java.nio.file.Files.createTempDirectory("pqcodes").toString
    codes.write.mode("overwrite").parquet(dir + "/arr")
    // BINARY is the most compact parquet storage of an m-byte code (no
    // per-element rep/def levels) — PqAdcDot accepts it natively
    val toBin = udf((xs: Seq[Byte]) => xs.toArray)
    codes.select($"id", toBin($"codes").as("codes")).write.mode("overwrite").parquet(dir + "/bin")
    val queries = mkVecs(5, 16, seed = 72).toDF("id", "v")
    def run(c: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      Pq.topKEncoded(queries, c, "id", "v", "id", "codes", k = 3, cb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val expected = run(codes)
    assert(expected.size == 15)
    // parquet-read ARRAY<TINYINT> arrives with containsNull=true — the
    // guarded element path, searched identically
    assert(run(spark.read.parquet(dir + "/arr")) == expected)
    assert(run(spark.read.parquet(dir + "/bin")) == expected)
  }

  test("pq_sdc_dot == dot(decode(a), decode(b)) exactly; geometry/range -> NULL") {
    val corpus = mkVecs(40, 16, seed = 101).toDF("id", "v")
    val cb = Pq.train(corpus, "id", "v", dim = 16, m = 4, ksub = 8, iters = 1)
    val codes = Pq.encodeCorpus(corpus, "id", "v", cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    val tableLit = typedLit(cb.sdcTable.toSeq)
    val df = Seq((1L, codes(1L), codes(2L)), (2L, codes(3L), codes(7L)))
      .toDF("pair", "a", "b")
    val got = df.select($"pair", Pq.sdcDot(tableLit, $"a", $"b").as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def direct(a: Array[Byte], b: Array[Byte]): Double = {
      val (ra, rb) = (cb.decode(a), cb.decode(b))
      // SDC sums per-subspace sub-dots; same association as the table build
      a.indices.map(j => (0 until cb.dsub).map(t =>
        ra(j * cb.dsub + t) * rb(j * cb.dsub + t)).sum).sum
    }
    assert(math.abs(got(1L) - direct(codes(1L), codes(2L))) < 1e-12)
    assert(math.abs(got(2L) - direct(codes(3L), codes(7L))) < 1e-12)
    // out-of-range code and length mismatch -> NULL (both code layouts)
    val bad = Seq((Array(9.toByte, 0.toByte), Array(0.toByte, 0.toByte))).toDF("a", "b")
    assert(bad.select(Pq.sdcDot(typedLit(Seq.fill(8)(1.0)), $"a", $"b")).head.isNullAt(0))
    val mismatch = Seq((Array(0.toByte), Array(0.toByte, 0.toByte))).toDF("a", "b")
    assert(mismatch.select(Pq.sdcDot(typedLit(Seq.fill(8)(1.0)), $"a", $"b")).head.isNullAt(0))
    // BINARY codes accepted: same score as ARRAY<TINYINT>
    import graft.functions.PqSdcDot
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val tab = Literal.create(cb.sdcTable, ArrayType(DoubleType))
    val asBin = PqSdcDot(tab,
      Literal.create(codes(1L), BinaryType), Literal.create(codes(2L), BinaryType)).eval()
    assert(math.abs(asBin.asInstanceOf[Double] - got(1L)) < 1e-12)
  }

  test("pinned geometry turns a coincidentally-square wrong table into NULL") {
    // the advice scenario: m=2 codes against an m=8/ksub=16 table
    // (2048 doubles). 2048/2 = 1024 = 32², so the 3-arg inference
    // "succeeds" with ksub=32 and returns a silently WRONG score; the
    // 5-arg pinned form must return NULL instead.
    val wrongTable = typedLit((0 until 8 * 16 * 16).map(_.toDouble * 0.5))
    val m2codes = Seq((Array(3.toByte, 7.toByte), Array(1.toByte, 2.toByte))).toDF("a", "b")
    // inference path: non-null (documented hazard of the exploratory form)
    val inferred = m2codes.select(Pq.sdcDot(wrongTable, $"a", $"b")).head
    assert(!inferred.isNullAt(0), "3-arg inference accepts the square-length table")
    // pinned path: the operator knows the true geometry -> NULL
    val m8cb = Pq.PqCodebook(8, 16, 2, new Array[Double](8 * 16 * 2))
    assert(m2codes.select(Pq.sdcDot(wrongTable, $"a", $"b", m8cb)).head.isNullAt(0),
      "pinned m/ksub must reject codes of the wrong m")
    // and pinned geometry that MATCHES still scores (non-null)
    val m2cb = Pq.PqCodebook(2, 32, 1, new Array[Double](2 * 32 * 1))
    assert(!m2codes.select(Pq.sdcDot(wrongTable, $"a", $"b", m2cb)).head.isNullAt(0))
  }

  test("sdcNearDupPairsEncoded finds planted near-duplicates over codes alone") {
    import graft.operators.Similarity
    val rng = new scala.util.Random(111)
    val base = (0 until 120).map(i => (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
    // plant near-dups: ids 1000+i are tiny perturbations of ids i < 10
    val dups = (0 until 10).map(i =>
      ((1000 + i).toLong, base(i)._2.map(x => x + rng.nextGaussian().toFloat * 0.01f)))
    val df = (base ++ dups).toDF("id", "v").cache()
    val idx = Similarity.ivfBuild(df, "id", "v", nCentroids = 4, kmeansIters = 2)
    val cb = Pq.train(df, "id", "v", dim = 16, m = 4, ksub = 16, iters = 2)
    val pairs = Pq.sdcNearDupPairsEncoded(Pq.ivfPqEncode(idx, "id", "v", cb), cb, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a perturbed twin encodes to (near-)identical codes in the same
    // cell, so every planted pair must surface
    val found = (0 until 10).count(i => pairs.contains((i.toLong, (1000 + i).toLong)))
    assert(found >= 9, s"only $found of 10 planted near-dup pairs found: $pairs")
    // and random pairs must not flood in: planted pairs dominate
    assert(pairs.size <= 30, s"too many spurious pairs: ${pairs.size}")
    df.unpersist()
  }

  test("knnGraphEncoded matches a driver-side recompute over reconstructions") {
    import graft.operators.Similarity
    val corpus = mkVecs(60, 16, seed = 141).toDF("id", "v").cache()
    val idx = Similarity.ivfBuild(corpus, "id", "v", nCentroids = 3, kmeansIters = 1)
    val cb = Pq.train(corpus, "id", "v", dim = 16, m = 4, ksub = 8, iters = 1)
    val encoded = Pq.ivfPqEncode(idx, "id", "v", cb).cache()
    val got = Pq.knnGraphEncoded(encoded, cb, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // driver ground truth: same-cell pairs ranked by cosine of the
    // reconstructions (same division, ties by cId)
    val rows = encoded.collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Byte](2).toArray))
    def cos(a: Array[Byte], b: Array[Byte]): Double = {
      // same per-subspace association as the kernel (sdcTable/normLut
      // partial sums): a flat left-to-right sum differs by ~1 ulp and
      // could flip an exact-rank assertion on a near-tie
      val (ra, rb) = (cb.decode(a), cb.decode(b))
      def subSums(x: Array[Double], y: Array[Double]): Double =
        (0 until cb.m).map(j => (0 until cb.dsub).map(t =>
          x(j * cb.dsub + t) * y(j * cb.dsub + t)).sum).sum
      subSums(ra, rb) / (math.sqrt(subSums(ra, ra)) * math.sqrt(subSums(rb, rb)))
    }
    for ((qid, cell, qc) <- rows) {
      val expected = rows.filter(r => r._2 == cell && r._1 != qid)
        .map { case (cid, _, cc) => (cid, cos(qc, cc)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(3).map(_._1)
      expected.zipWithIndex.foreach { case (cid, i) =>
        assert(got((qid, i + 1)) == cid, s"q=$qid rank=${i + 1}")
      }
    }
    encoded.unpersist(); corpus.unpersist()
  }

  test("semanticDedupEncoded: one survivor (min id) per transitive near-dup component") {
    import graft.operators.Similarity
    val rng = new scala.util.Random(131)
    val base = (0 until 100).map(i => (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
    // twins of ids < 8, and twins-of-twins: a CHAIN a~b~c that only a
    // transitive collapse reduces to one survivor
    val twins = (0 until 8).map(i =>
      ((1000 + i).toLong, base(i)._2.map(x => x + rng.nextGaussian().toFloat * 0.005f)))
    val chain = (0 until 8).map(i =>
      ((2000 + i).toLong, twins(i)._2.map(x => x + rng.nextGaussian().toFloat * 0.005f)))
    val df = (base ++ twins ++ chain).toDF("id", "v").cache()
    val idx = Similarity.ivfBuild(df, "id", "v", nCentroids = 4, kmeansIters = 2)
    val cb = Pq.train(df, "id", "v", dim = 16, m = 4, ksub = 16, iters = 2)
    val encoded = Pq.ivfPqEncode(idx, "id", "v", cb).cache()
    val cellOf = encoded.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val survivors = Pq.semanticDedupEncoded(encoded, cb, 0.95)
      .collect().map(_.getLong(0)).toSet
    // the min id of every component always survives, and no base row is
    // falsely dropped (random 16-d pairs don't reach cos 0.95 after PQ
    // reconstruction except by rare collision)
    (0 until 8).foreach(i => assert(survivors.contains(i.toLong), s"min id $i must survive"))
    assert((0 until 100).count(i => survivors.contains(i.toLong)) >= 99)
    // the WITHIN-CELL contract: a planted dup may survive ONLY by the
    // documented cell-boundary escape — it shares no IVF cell with any
    // member of its chain (the scaladoc's recall caveat)
    val escaped = (0 until 8).flatMap { i =>
      val group = Seq(i.toLong, (1000 + i).toLong, (2000 + i).toLong)
      group.tail.filter(survivors.contains).map(d => (d, group))
    }
    escaped.foreach { case (d, group) =>
      val others = group.filterNot(_ == d)
      assert(!others.exists(o => cellOf(o) == cellOf(d)),
        s"dup $d survived while sharing cell ${cellOf(d)} with ${others.map(cellOf)}")
    }
    // escapes are the exception, not the rule
    assert(escaped.size <= 4, s"too many boundary escapes: $escaped")
    encoded.unpersist()
    df.unpersist()
  }

  test("residual IVFADC scores == cosine of (centroid + decoded residual), exactly") {
    import graft.operators.Similarity
    val corpus = mkVecs(50, 16, seed = 81).toDF("id", "v").cache()
    val idx = Similarity.ivfBuild(corpus, "id", "v", nCentroids = 4, kmeansIters = 1)
    val cb = Pq.trainResidual(idx, "id", "v", dim = 16, m = 4, ksub = 8, iters = 1)
    val queries = mkVecs(5, 16, seed = 82)
    val got = Pq.ivfPqTopKResidual(idx, queries.toDF("id", "v"), "id", "v", "id", "v",
        k = 50, cb, nProbe = 4, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == 5 * 50, "nProbe = all cells: every pair scored")
    // driver-side ground truth: reconstruction = centroid + decoded residual
    val prepared = Pq.ivfPqEncodeResidual(idx, "id", "v", cb).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2).toArray)).toMap
    val cents = idx.centroids.toMap
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for ((qid, qv) <- queries; (cid, (cent, codes)) <- prepared) {
      val res = cb.decode(codes)
      val recon = cents(cent).zip(res).map { case (a, b) => a + b }
      val dot = qv.indices.map(i => qv(i).toDouble * recon(i)).sum
      val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
      val cn = math.sqrt(recon.map(x => x * x).sum)
      assert(math.abs(got((qid, cid)) - dot / (qn * cn)) < 1e-9, s"q=$qid c=$cid")
    }
    corpus.unpersist()
  }

  test("rotation is orthonormal; rotated-residual scores == cosine of (centroid + R^T decoded), exactly") {
    import graft.operators.Similarity
    val rot = Pq.rotation(16, seed = 7L)
    // R·Rᵀ = I to float precision
    for (r <- 0 until 16; c <- 0 until 16) {
      val d = (0 until 16).map(t => rot.flat(r * 16 + t) * rot.flat(c * 16 + t)).sum
      assert(math.abs(d - (if (r == c) 1.0 else 0.0)) < 1e-12, s"RRt($r,$c)=$d")
    }
    val corpus = mkVecs(50, 16, seed = 83).toDF("id", "v").cache()
    val idx = Similarity.ivfBuild(corpus, "id", "v", nCentroids = 4, kmeansIters = 1)
    val cb = Pq.trainResidual(idx, "id", "v", dim = 16, m = 4, ksub = 8, iters = 1,
      rot = Some(rot))
    val queries = mkVecs(5, 16, seed = 84)
    val got = Pq.ivfPqTopKResidual(idx, queries.toDF("id", "v"), "id", "v", "id", "v",
        k = 50, cb, nProbe = 4, excludeSelf = false, rot = Some(rot))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == 5 * 50)
    // ground truth: reconstruction = centroid + Rᵀ · decode(codes)
    // (codes live in rotated space; Rᵀ = R⁻¹ maps the decoded residual back)
    val prepared = Pq.ivfPqEncodeResidual(idx, "id", "v", cb, rot = Some(rot)).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2).toArray)).toMap
    val cents = idx.centroids.toMap
    for ((qid, qv) <- queries; (cid, (cent, codes)) <- prepared) {
      val resRot = cb.decode(codes)
      val res = Array.tabulate(16)(t => (0 until 16).map(r => rot.flat(r * 16 + t) * resRot(r)).sum)
      val recon = cents(cent).zip(res).map { case (a, b) => a + b }
      val dot = qv.indices.map(i => qv(i).toDouble * recon(i)).sum
      val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
      val cn = math.sqrt(recon.map(x => x * x).sum)
      assert(math.abs(got((qid, cid)) - dot / (qn * cn)) < 1e-9, s"q=$qid c=$cid")
    }
    corpus.unpersist()
  }

  test("non-parametric OPQ rotation: orthonormal, deterministic, and no worse than identity") {
    import graft.operators.Similarity
    // correlated clustered data (the regime a learned rotation exists
    // for): per-cluster offsets whose dimensions co-vary across the
    // subspace boundary, so independent per-subspace quantizers waste
    // codewords until the rotation decorrelates them
    val rng = new scala.util.Random(107)
    val centers = Array.fill(6)(Array.fill(16)(rng.nextGaussian() * 8))
    val data = (0 until 240).map { i =>
      val c = centers(i % 6)
      val s = rng.nextGaussian() // shared factor -> cross-dim correlation
      (i.toLong, Array.tabulate(16)(t => (c(t) + s * (1.0 + 0.2 * t) + rng.nextGaussian() * 0.3).toFloat))
    }
    val df = data.toDF("id", "v").cache()
    val idx = Similarity.ivfBuild(df, "id", "v", nCentroids = 6, kmeansIters = 2)
    val rot = Pq.opqRotationResidual(idx, "id", "v", dim = 16, m = 4, ksub = 8)
    // Procrustes output is exactly orthogonal (U·Vt of an SVD)
    for (r <- 0 until 16; c <- 0 until 16) {
      val d = (0 until 16).map(t => rot.flat(r * 16 + t) * rot.flat(c * 16 + t)).sum
      assert(math.abs(d - (if (r == c) 1.0 else 0.0)) < 1e-9, s"RRt($r,$c)=$d")
    }
    // bit-deterministic: the alternation runs driver-side over the
    // xxhash64-prefix sample — a second call is identical
    val rot2 = Pq.opqRotationResidual(idx, "id", "v", dim = 16, m = 4, ksub = 8)
    assert(rot.flat.sameElements(rot2.flat), "OPQ rotation must be deterministic")
    // recall at the same bit budget: learned rotation >= identity
    val queries = df.filter($"id" < 20)
    val bf = Similarity.bruteForceTopK(queries, df, "id", "v", "id", "v", k = 5)
      .select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rotOpt: Option[Pq.Rotation]): Double = {
      val cb = Pq.trainResidual(idx, "id", "v", dim = 16, m = 4, ksub = 8,
        iters = 2, rot = rotOpt)
      val s = Pq.ivfPqTopKResidual(idx, queries, "id", "v", "id", "v",
          k = 5, cb, nProbe = 6, rot = rotOpt)
        .select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf intersect s).size.toDouble / bf.size
    }
    val rId = recallOf(None)
    val rOpq = recallOf(Some(rot))
    assert(rOpq >= rId, s"OPQ recall $rOpq regressed below identity $rId")
    df.unpersist()
  }

  test("residual encoding beats flat PQ recall at the same bit budget") {
    import graft.operators.Similarity
    // clustered data where flat PQ collapses within-cluster order to
    // ties (the topK-test caveat): residuals are offsets AROUND the
    // cell centroid, so the same m=4/ksub=8 codes capture within-cell
    // structure that flat codes cannot
    val rng = new scala.util.Random(91)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian() * 10))
    val data = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rng.nextGaussian()).toFloat))
    }
    val df = data.toDF("id", "v").cache()
    val queries = df.filter($"id" < 20)
    val bf = Similarity.bruteForceTopK(queries, df, "id", "v", "id", "v", k = 5)
      .select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.ivfBuild(df, "id", "v", nCentroids = 8, kmeansIters = 2)
    def recallOf(top: org.apache.spark.sql.DataFrame): Double = {
      val s = top.select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf intersect s).size.toDouble / bf.size
    }
    val flatCb = Pq.train(df, "id", "v", dim = 16, m = 4, ksub = 8, iters = 2)
    val flat = recallOf(Pq.ivfPqTopK(idx, queries, "id", "v", "id", "v",
      k = 5, flatCb, nProbe = 8))
    val resCb = Pq.trainResidual(idx, "id", "v", dim = 16, m = 4, ksub = 8, iters = 2)
    val residual = recallOf(Pq.ivfPqTopKResidual(idx, queries, "id", "v", "id", "v",
      k = 5, resCb, nProbe = 8))
    assert(residual > flat + 0.1,
      s"residual recall $residual should clearly beat flat $flat at the same geometry")
    df.unpersist()
  }

  test("ivfPqTopK (IVFADC): coarse pruning + ADC, encoded path identical") {
    import graft.operators.Similarity
    // the clustered-data setup of the topK test: IVF cells align with
    // the true clusters, so probing nProbe=2 of 8 cells must still find
    // same-cluster neighbors
    val rng = new scala.util.Random(61)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian() * 10))
    val data = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat))
    }
    val df = data.toDF("id", "v").cache()
    val cb = Pq.train(df, "id", "v", dim = 16, m = 4, ksub = 16, iters = 2)
    val idx = Similarity.ivfBuild(df, "id", "v", nCentroids = 8, kmeansIters = 2)
    val queries = df.filter($"id" < 20)
    val got = Pq.ivfPqTopK(idx, queries, "id", "v", "id", "v", k = 5, cb, nProbe = 2)
      .select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    val sameCluster = got.count { case (q, c) => q % 8 == c % 8 }
    assert(sameCluster.toDouble / got.length >= 0.95,
      s"IVFADC cluster precision ${sameCluster.toDouble / got.length}")
    // persist-once path: ivfPqEncode then search the (cent, codes) — identical
    val prepared = Pq.ivfPqEncode(idx, "id", "v", cb)
    assert(prepared.columns.toSeq == Seq("cId", "cent", "codes"))
    val got2 = Pq.ivfPqTopKEncoded(idx, prepared, queries, "id", "v", k = 5, cb, nProbe = 2)
      .select($"qId", $"cId").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.toSet == got.toSet, "encoded IVFADC must equal inline IVFADC")
    // pruning really happened: every returned candidate lies in a probed
    // cell, and with nProbe=2 of 8 populated cells a full-corpus scan
    // (the pre-IVFADC topK) must see strictly more candidate pairs
    val full = Pq.topK(queries, df, "id", "v", "id", "v", k = 5, cb)
      .select($"qId", $"cId").collect()
    assert(full.length == got.length, "same k rows per query either way")
    df.unpersist()
  }
}
