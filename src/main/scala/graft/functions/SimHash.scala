package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 64-bit SimHash over a token array: each token votes ±1 on every bit of
 * its 64-bit hash; the result sets bits with positive tallies. Two
 * near-identical documents differ in few bits (small Hamming distance),
 * so near-duplicate candidates can be bucketed by 16-bit bands.
 *
 * Native Catalyst expression (single pass, primitive arrays) rather than
 * a Scala UDF: no row-level serialization, null-safe, usable from SQL.
 */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got $dt")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
  override def prettyName: String = "simhash64"
}

/**
 * Word-shingle hashing shared by the text-similarity expressions: one
 * pass over the token array, hashing each `shingleSize`-gram with FNV-1a
 * over the tokens' UTF-8 bytes (0x20 separator) + a splitmix64 finalize.
 * Fewer than `shingleSize` tokens yield a single whole-text shingle.
 *
 * A native expression rather than a `transform(sequence…)` Column tree
 * on purpose: higher-order-function lambdas are interpreted and
 * re-evaluate their free subtrees (the regex `split`!) once PER ELEMENT,
 * which made the Column formulation quadratic per document.
 */
private[functions] object Shingling {
  @inline def foreachShingleHash(arr: ArrayData, shingleSize: Int)(f: Long => Unit): Unit = {
    val nTok = arr.numElements()
    val nSh = math.max(1, nTok - shingleSize + 1)
    var s = 0
    while (s < nSh) {
      var h = 0xcbf29ce484222325L
      val end = math.min(s + shingleSize, nTok)
      var t = s
      while (t < end) {
        if (t > s) { h ^= 0x20L; h *= 0x100000001b3L }
        if (!arr.isNullAt(t)) {
          val bytes = arr.getUTF8String(t).getBytes
          var i = 0
          while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
        }
        t += 1
      }
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      f(h ^ (h >>> 31))
      s += 1
    }
  }

  val tokensType: DataType = ArrayType(StringType)
  def checkTokens(name: String, dt: DataType) = dt match {
    case StringType | ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$name expects STRING text or ARRAY<STRING> tokens, got $other")
  }

  /** Per-thread scratch for [[lowerAndTokenize]] (the expression
    * objects are shared across local-mode task threads). After a
    * `lowerAndTokenize(u)` call: `view` holds the lowered bytes,
    * `offs(i)/lens(i)` for i < nTok delimit the tokens of
    * `tokens(lower(text))`. */
  private[functions] final class TextScratch {
    var buf = new Array[Byte](4096)   // lowered ASCII bytes
    var offs = new Array[Int](256)    // token start offsets into the byte view
    var lens = new Array[Int](256)    // token byte lengths
    var view: Array[Byte] = null      // lowered byte view of the LAST call
    var viewLen = 0                   // valid bytes in `view`
    var nTok = 0
    var out = new Array[Byte](4096)   // normalized-output buffer (fingerprints)
    def ensureOut(n: Int): Array[Byte] = {
      if (out.length < n) out = new Array[Byte](java.lang.Integer.highestOneBit(math.max(n, 1)) * 2)
      out
    }
  }
  private val textScratch = new ThreadLocal[TextScratch] {
    override def initialValue(): TextScratch = new TextScratch
  }

  /** Mirror of `Lower`'s collation dispatch for the non-ASCII fallback:
    * default-collation strings are UTF8_BINARY, and the ICU flag is the
    * same lazily-read conf `Lower` captures. */
  private val lowerCollationId =
    org.apache.spark.sql.catalyst.util.CollationFactory.UTF8_BINARY_COLLATION_ID
  private lazy val lowerUseICU: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.getConf(
      org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  /** Byte-level twin of [[foreachShingleHash]] over the RAW text: emits
    * the exact hashes of `foreachShingleHash(tokens(lower(text)))`
    * without decoding to java Strings, without the regex split, and
    * without materializing the token array (the dominant per-row cost of
    * every shingle consumer — BENCH_CONTEXT round 14). Parity is by
    * construction plus the ShinglingTextSpec fuzz:
    *
    *  - `lower`: full-ASCII inputs get the same per-byte 'A'..'Z'+32 map
    *    `UTF8String.toLowerCaseAscii` applies; anything else falls back
    *    to `CollationSupport.Lower.exec(u, UTF8_BINARY, icuCaseMappings)`
    *    — the EXACT call Spark's `Lower` makes — and proceeds on ITS
    *    bytes. (NOT `UTF8String.toLowerCase`: with the default
    *    `spark.sql.icu.caseMappings.enabled=true` Spark lowers via ICU
    *    code-point mapping, so final sigma Σ→σ everywhere, while the
    *    JDK path lowers contextually Σ→ς at word ends — the
    *    ShinglingTextSpec fuzz caught the one-codepoint divergence.)
    *  - `trim`: ASCII 0x20 strip at both ends (Spark's trim()).
    *  - `split(trimmed, "\\s+")` with Spark's default limit -1: Java
    *    regex `\s` without UNICODE_CHARACTER_CLASS is exactly
    *    {0x09..0x0D, 0x20}, none of which can be a UTF-8 continuation
    *    byte, so byte-run splitting is exact — including the leading
    *    empty token after a non-space-whitespace head and the single
    *    trailing empty token after a whitespace tail.
    *  - `tokens()`'s empty guard: whitespace-only text is an EMPTY token
    *    array, which [[foreachShingleHash]] maps to the one
    *    zero-token shingle (the finalized FNV basis) — reproduced.
    */
  /** Fill the thread scratch with the lowered byte view and the token
    * boundaries of `tokens(lower(text))` — Spark's exact semantics, no
    * String decode, no regex, no array materialization (see
    * [[foreachShingleHashText]] for the parity argument). */
  /** Fill the thread scratch's `view`/`viewLen` with the lowered byte
    * view of the text — `lower(text)`'s exact bytes (ASCII fast path;
    * `CollationSupport.Lower.exec`, the call Spark's `Lower` makes,
    * otherwise). */
  private[functions] def lowerView(u: UTF8String): TextScratch = {
    val sc = textScratch.get()
    val n = u.numBytes
    if (u.isFullAscii) {
      if (sc.buf.length < n) sc.buf = new Array[Byte](java.lang.Integer.highestOneBit(math.max(n, 1)) * 2)
      val a = sc.buf
      var i = 0
      while (i < n) {
        val b = u.getByte(i)
        a(i) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        i += 1
      }
      sc.view = a
      sc.viewLen = n
    } else {
      val a = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
        .exec(u, lowerCollationId, lowerUseICU).getBytes
      sc.view = a
      sc.viewLen = a.length
    }
    sc
  }

  private[functions] def lowerAndTokenize(u: UTF8String): TextScratch = {
    val sc = lowerView(u)
    val a = sc.view
    val end0 = sc.viewLen
    // trim: ASCII space only
    var b0 = 0
    var e0 = end0
    while (b0 < e0 && a(b0) == 0x20) b0 += 1
    while (e0 > b0 && a(e0 - 1) == 0x20) e0 -= 1
    // tokenize with split(…, -1) semantics into (offs, lens)
    var offs = sc.offs
    var lens = sc.lens
    var nTok = 0
    @inline def push(off: Int, len: Int): Unit = {
      if (nTok == offs.length) {
        offs = java.util.Arrays.copyOf(offs, nTok * 2); sc.offs = offs
        lens = java.util.Arrays.copyOf(lens, nTok * 2); sc.lens = lens
      }
      offs(nTok) = off; lens(nTok) = len; nTok += 1
    }
    @inline def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)
    if (b0 < e0) { // empty after trim ⇒ tokens() yields an EMPTY array
      var i = b0
      if (isWs(a(i))) { // leading whitespace run → leading empty token
        push(i, 0)
        while (i < e0 && isWs(a(i))) i += 1
        if (i == e0) push(i, 0) // all-whitespace: split("\t", -1) == ["", ""]
      }
      while (i < e0) {
        val st = i
        while (i < e0 && !isWs(a(i))) i += 1
        push(st, i - st)
        if (i < e0) {
          while (i < e0 && isWs(a(i))) i += 1
          if (i == e0) push(i, 0) // trailing empty under limit -1
        }
      }
    }
    sc.nTok = nTok
    sc
  }

  @inline def foreachShingleHashText(u: UTF8String, shingleSize: Int)(f: Long => Unit): Unit = {
    val sc = lowerAndTokenize(u)
    val a = sc.view
    val offs = sc.offs
    val lens = sc.lens
    val nTok = sc.nTok
    // shingle walk — the same arithmetic as foreachShingleHash
    val nSh = math.max(1, nTok - shingleSize + 1)
    var s = 0
    while (s < nSh) {
      var h = 0xcbf29ce484222325L
      val end = math.min(s + shingleSize, nTok)
      var t = s
      while (t < end) {
        if (t > s) { h ^= 0x20L; h *= 0x100000001b3L }
        var i = offs(t)
        val e = i + lens(t)
        while (i < e) { h ^= (a(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
        t += 1
      }
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      f(h ^ (h >>> 31))
      s += 1
    }
  }

  /** Dispatch on the (analysis-checked) input type: raw STRING text goes
    * through the byte-level path, a pre-tokenized ARRAY<STRING> through
    * the token-array walk. */
  @inline def foreachShingleHashInput(v: Any, isText: Boolean, shingleSize: Int)(f: Long => Unit): Unit =
    if (isText) foreachShingleHashText(v.asInstanceOf[UTF8String], shingleSize)(f)
    else foreachShingleHash(v.asInstanceOf[ArrayData], shingleSize)(f)
}

/** All word-shingle hashes of a token array (the exact-Jaccard input). */
case class ShingleHashes(child: Expression, shingleSize: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = Shingling.checkTokens(prettyName, child.dataType)
  @transient private lazy val isText = child.dataType == StringType

  override def nullSafeEval(v: Any): Any = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    Shingling.foreachShingleHashInput(v, isText, shingleSize)(out += _)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/**
 * Fused shingle → MinHash signature → (optionally) LSH band hashes, one
 * tight pass over the token array. For each of `numHashes` seeded hash
 * functions, the minimum splitmix64-remixed shingle hash; with
 * `bands > 0` the output is instead the `bands` band hashes (FNV over
 * each signature slice), which is all LSH bucketing needs — `bands`
 * longs per row instead of `numHashes`.
 */
case class MinHashSignature(child: Expression, numHashes: Int,
                            shingleSize: Int = 3, bands: Int = 0)
  extends UnaryExpression with CodegenFallback {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  require(bands <= numHashes,
    s"bands ($bands) must not exceed numHashes ($numHashes) — rows-per-band would be 0 " +
    "and every band hash an empty slice")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = Shingling.checkTokens(prettyName, child.dataType)
  @transient private lazy val isText = child.dataType == StringType

  override def nullSafeEval(v: Any): Any = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    Shingling.foreachShingleHashInput(v, isText, shingleSize) { h =>
      var k = 0
      while (k < numHashes) {
        // splitmix64 remix of (shingle ^ golden-ratio seed k)
        var x = h ^ (0x9e3779b97f4a7c15L * (k + 1))
        x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
        x ^= x >>> 27; x *= 0x94d049bb133111ebL
        x ^= x >>> 31
        if (x < sig(k)) sig(k) = x
        k += 1
      }
    }
    if (bands <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
    else {
      val r = numHashes / bands
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 0xcbf29ce484222325L ^ b.toLong
        var k = b * r
        val end = if (b == bands - 1) numHashes else (b + 1) * r
        while (k < end) {
          var x = sig(k)
          var i = 0
          while (i < 8) { h ^= (x & 0xffL); h *= 0x100000001b3L; x >>>= 8; i += 1 }
          k += 1
        }
        h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
        h ^= h >>> 27; h *= 0x94d049bb133111ebL
        out(b) = h ^ (h >>> 31)
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = if (bands > 0) "minhash_bands" else "minhash_signature"
}

/**
 * Fused LSH-preparation pass: band hashes AND the distinct shingle-hash
 * set from ONE walk over the token array, as a struct. The near-dedup
 * operator needs both per document (bands for bucketing, shingle sets
 * for exact-Jaccard verification); computing them as two expressions
 * re-tokenizes and re-shingles every row — CodegenFallback evals are
 * opaque to subexpression elimination — so at corpus scale the dominant
 * per-row cost ran twice. The shingle set is sorted-deduped (its only
 * consumers are order-insensitive set intersect/union sizes).
 */
case class MinHashPrepare(child: Expression, numHashes: Int,
                          shingleSize: Int, bands: Int)
  extends UnaryExpression with CodegenFallback {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  require(bands > 0 && bands <= numHashes,
    s"bands ($bands) must be in [1, numHashes=$numHashes]")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bands", ArrayType(LongType, containsNull = false), nullable = false),
    org.apache.spark.sql.types.StructField("sh", ArrayType(LongType, containsNull = false), nullable = false)))
  override def checkInputDataTypes() = Shingling.checkTokens(prettyName, child.dataType)
  @transient private lazy val isText = child.dataType == StringType

  override def nullSafeEval(v: Any): Any = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sh = new scala.collection.mutable.ArrayBuffer[Long](16)
    Shingling.foreachShingleHashInput(v, isText, shingleSize) { h =>
      sh += h
      var k = 0
      while (k < numHashes) {
        // splitmix64 remix of (shingle ^ golden-ratio seed k) — MUST
        // stay bit-identical to MinHashSignature's per-seed remix
        var x = h ^ (0x9e3779b97f4a7c15L * (k + 1))
        x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
        x ^= x >>> 27; x *= 0x94d049bb133111ebL
        x ^= x >>> 31
        if (x < sig(k)) sig(k) = x
        k += 1
      }
    }
    // band fold, identical to MinHashSignature's bands > 0 branch
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var k = b * r
      val end = if (b == bands - 1) numHashes else (b + 1) * r
      while (k < end) {
        var x = sig(k)
        var i = 0
        while (i < 8) { h ^= (x & 0xffL); h *= 0x100000001b3L; x >>>= 8; i += 1 }
        k += 1
      }
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      out(b) = h ^ (h >>> 31)
      b += 1
    }
    // sorted dedup of the shingle hashes (≡ array_distinct up to order)
    val sorted = sh.toArray
    java.util.Arrays.sort(sorted)
    var n = 0
    var i = 0
    while (i < sorted.length) {
      if (n == 0 || sorted(i) != sorted(n - 1)) { sorted(n) = sorted(i); n += 1 }
      i += 1
    }
    val distinct = if (n == sorted.length) sorted else java.util.Arrays.copyOf(sorted, n)
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(distinct))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashPrepare =
    copy(child = newChild)
  override def prettyName: String = "minhash_prepare"
}

/**
 * Top n-gram fraction: count of the most frequent token n-gram divided
 * by the total n-gram count — the Gopher-style within-document
 * repetition signal (boilerplate/loop detector). One pass per row with
 * a per-row hash map; the declarative alternative (explode + two
 * groupBys) would shuffle the whole exploded corpus for a per-document
 * score. Documents shorter than `n` tokens count their whole token
 * sequence as the single n-gram (score 1.0), matching [[Shingling]].
 */
case class RepetitionScore(child: Expression, shingleSize: Int)
  extends UnaryExpression with CodegenFallback {

  require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = Shingling.checkTokens(prettyName, child.dataType)
  @transient private lazy val isText = child.dataType == StringType

  override def nullSafeEval(v: Any): Any = {
    val counts = new scala.collection.mutable.LongMap[Int](64)
    var total = 0
    var best = 0
    Shingling.foreachShingleHashInput(v, isText, shingleSize) { h =>
      val c = counts.getOrElse(h, 0) + 1
      counts.update(h, c)
      if (c > best) best = c
      total += 1
    }
    if (total == 0) 0.0 else best.toDouble / total
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionScore =
    copy(child = newChild)
  override def prettyName: String = "repetition_score"
}

object SimHash64 {
  /** Deterministic 64-bit string hash (FNV-1a over UTF-8 bytes, mixed). */
  private[functions] def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    // finalization mix (splitmix64) to decorrelate low bits
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Column helper (requires [[graft.Graft.register]]). */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
}
