package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `all_ngrams(text, n)` → ARRAY<STRING> — every word `n`-gram WITH
 * multiplicity (space-joined, document order). The TRAINING-side twin
 * of [[DistinctNgrams]]: a language model needs occurrence counts, so
 * the per-document dedup that makes mining cheap would be wrong here.
 *
 * Same pinned token contract (maximal non-`\s` byte runs under Java's
 * ASCII `\s` = {0x09..0x0D, 0x20}, empties dropped, case preserved) but
 * NO short-document rule: an `n`-gram statistic needs `n` tokens, so a
 * document with fewer yields an EMPTY array (it contributes nothing to
 * the model) — documented divergence from the mining walker, whose
 * whole-sequence rule exists so short duplicates still collide.
 */
case class AllNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"all_ngrams: n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  @inline private def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)

  def compute(u: UTF8String): GenericArrayData = {
    val a = u.getBytes
    val len = a.length
    var cap = 16
    var offs = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(a(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !isWs(a(i))) i += 1
        if (nTok == cap) {
          cap <<= 1
          offs = java.util.Arrays.copyOf(offs, cap)
          lens = java.util.Arrays.copyOf(lens, cap)
        }
        offs(nTok) = s; lens(nTok) = i - s; nTok += 1
      }
    }
    val nGrams = nTok - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val e = g + n
      var bl = n - 1
      var t = g
      while (t < e) { bl += lens(t); t += 1 }
      val bs = new Array[Byte](bl)
      var p = 0
      t = g
      while (t < e) {
        if (t > g) { bs(p) = 0x20; p += 1 }
        System.arraycopy(a, offs(t), bs, p, lens(t))
        p += lens(t)
        t += 1
      }
      out(g) = UTF8String.fromBytes(bs)
      g += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[AllNgrams].getName
    val ref = ctx.addReferenceObj("allNgrams", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AllNgrams =
    copy(child = newChild)
  override def prettyName: String = "all_ngrams"
}

/**
 * The broadcast payload of a trained bigram language model: parallel
 * key/count arrays (keys are the grams' UTF-8 bytes; a bigram key is
 * `prev 0x20 cur`, which determines the token pair uniquely because
 * tokens contain no whitespace) plus the smoothing constants. Arrays,
 * not a Map — the probe tables are built once per executor from this
 * and cached by broadcast id ([[LmScore.tablesFor]]), so the wire form
 * stays as flat as possible.
 */
final class LmModel(val bigramKeys: Array[Array[Byte]], val bigramCounts: Array[Long],
                    val unigramKeys: Array[Array[Byte]], val unigramCounts: Array[Long],
                    val vocab: Long) extends Serializable {
  require(bigramKeys.length == bigramCounts.length, "bigram key/count length mismatch")
  require(unigramKeys.length == unigramCounts.length, "unigram key/count length mismatch")
  require(vocab > 0, "an LM needs a non-empty vocabulary")
}

/**
 * `lm_score(text)` → DOUBLE — per-document negative mean bigram
 * log-likelihood under a corpus-trained add-α model (the CCNet-style
 * LM quality signal: low = fluent under the reference corpus, high =
 * off-distribution junk):
 *
 *   score(d) = −(1/(T−1)) · Σ_{i=2..T} ln P(t_i | t_{i−1})
 *   P(w | p)  = (c(p,w) + α) / (c(p) + α·V)
 *
 * with V = the training vocabulary size and c(·) the broadcast counts
 * (an unseen history backs off to the uniform 1/V — scoring a corpus
 * the model wasn't trained on is the normal case). A document with
 * fewer than two tokens has no bigram evidence → NULL, the caller's
 * policy decision, like every NULL contract in this library.
 *
 * ONE byte walk per document, zero shuffles: both probe tables are
 * FNV-1a open addressing over the model's key bytes
 * ([[RemoveDupSpans]]'s scheme, including the executor-lifetime
 * soft-referenced cache keyed by broadcast id), each bigram hashes
 * straight from the document buffer — no gram string, no token array
 * is ever materialized. P < 1 strictly (c(p,w)+1 ≤ c(p) < c(p)+α·V
 * because every counted bigram also counted its history), so the score
 * is strictly positive where defined.
 */
case class LmScore(child: Expression, bc: Broadcast[LmModel], alpha: Double)
    extends UnaryExpression {
  require(alpha > 0, s"lm_score: smoothing alpha must be positive, got $alpha")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // short documents score NULL
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  @transient private lazy val tables: LmScore.Tables = LmScore.tablesFor(bc)

  @inline private def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)

  /** Returns a boxed Double, or null when the document has < 2 tokens. */
  def compute(u: UTF8String): Any = {
    val a = u.getBytes
    val len = a.length
    var cap = 16
    var offs = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(a(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !isWs(a(i))) i += 1
        if (nTok == cap) {
          cap <<= 1
          offs = java.util.Arrays.copyOf(offs, cap)
          lens = java.util.Arrays.copyOf(lens, cap)
        }
        offs(nTok) = s; lens(nTok) = i - s; nTok += 1
      }
    }
    if (nTok < 2) return null
    val t = tables
    val aV = alpha * t.vocab
    var sum = 0.0
    var g = 1
    while (g < nTok) {
      // unigram hash of the history token, straight from the buffer
      var hu = -2128831035
      val po = offs(g - 1); val pl = lens(g - 1)
      var j = 0
      while (j < pl) { hu = (hu ^ (a(po + j) & 0xff)) * 16777619; j += 1 }
      // the bigram key continues the same FNV stream: `prev 0x20 cur`
      var hb = (hu ^ 0x20) * 16777619
      val co = offs(g); val cl = lens(g)
      j = 0
      while (j < cl) { hb = (hb ^ (a(co + j) & 0xff)) * 16777619; j += 1 }
      val cu = t.uni.lookup(hu, a, offs, lens, g - 1, g)
      val cb = t.big.lookup(hb, a, offs, lens, g - 1, g + 1)
      sum += math.log((cb + alpha) / (cu + aV))
      g += 1
    }
    -sum / (nTok - 1)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[LmScore].getName
    val ref = ctx.addReferenceObj("lmScore", this, cls)
    val r = ctx.freshName("lmScoreResult")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = (($cls) $ref).compute($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
  override def prettyName: String = "lm_score"
  // broadcast handles must never print their value (plan strings, logs)
  override def toString: String = s"lm_score(${child.toString}, model=#${bc.id}, alpha=$alpha)"
}

object LmScore {

  /** One open-addressing count table: gram bytes → count, 0 if absent.
    * Probes compare byte-exactly against the window `[g, e)` of the
    * document's token spans joined by single 0x20 — a hash collision
    * can never return another gram's count. */
  private[functions] final class CountTable(val slots: Array[Array[Byte]],
                                            val counts: Array[Long],
                                            val hashes: Array[Int], val mask: Int) {
    def lookup(h: Int, a: Array[Byte], offs: Array[Int], lens: Array[Int],
               g: Int, e: Int): Long = {
      var p = h & mask
      while (true) {
        val kb = slots(p)
        if (kb == null) return 0L
        if (hashes(p) == h && windowEquals(kb, a, offs, lens, g, e)) return counts(p)
        p = (p + 1) & mask
      }
      0L // unreachable
    }

    private def windowEquals(kb: Array[Byte], a: Array[Byte],
                             offs: Array[Int], lens: Array[Int], g: Int, e: Int): Boolean = {
      var need = e - g - 1
      var tk = g
      while (tk < e) { need += lens(tk); tk += 1 }
      if (kb.length != need) return false
      var p = 0
      tk = g
      while (tk < e) {
        if (tk > g) { if (kb(p) != 0x20) return false; p += 1 }
        val o = offs(tk); val l = lens(tk)
        var j = 0
        while (j < l) { if (kb(p) != a(o + j)) return false; p += 1; j += 1 }
        tk += 1
      }
      true
    }
  }

  private[functions] final class Tables(val big: CountTable, val uni: CountTable,
                                        val vocab: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.ref.SoftReference[Tables]]()

  private[functions] def tablesFor(bc: Broadcast[LmModel]): Tables = {
    val ref = cache.get(bc.id)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) return hit
    val m = bc.value
    val built = new Tables(
      build(m.bigramKeys, m.bigramCounts),
      build(m.unigramKeys, m.unigramCounts), m.vocab)
    cache.put(bc.id, new java.lang.ref.SoftReference(built))
    built
  }

  private def build(keys: Array[Array[Byte]], cnts: Array[Long]): CountTable = {
    var cap = 16
    while (cap < keys.length * 2) cap <<= 1
    val sl = new Array[Array[Byte]](cap)
    val ct = new Array[Long](cap)
    val hs = new Array[Int](cap)
    val m = cap - 1
    var i = 0
    while (i < keys.length) {
      val kb = keys(i)
      var h = -2128831035
      var j = 0
      while (j < kb.length) { h = (h ^ (kb(j) & 0xff)) * 16777619; j += 1 }
      var s = h & m
      while (sl(s) != null && !java.util.Arrays.equals(sl(s), kb)) s = (s + 1) & m
      // duplicate keys accumulate — training dedups, but the table
      // must not silently drop a count if a caller hands it raw pairs
      if (sl(s) == null) { sl(s) = kb; hs(s) = h; ct(s) = cnts(i) }
      else ct(s) += cnts(i)
      i += 1
    }
    new CountTable(sl, ct, hs, m)
  }
}
