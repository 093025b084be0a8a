package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `remove_dup_spans(text)` → STRUCT<text STRING, n_removed INT,
 * n_tokens INT> — the REMOVAL step of exact-substring deduplication
 * (Lee et al., "Deduplicating Training Data Makes Language Models
 * Better", ACL 2022) at word-`n`-gram granularity: every token covered
 * by ANY occurrence of a gram in the duplicated-gram set is dropped,
 * and the surviving tokens are re-joined with single spaces (the
 * library's whitespace-normalizing rebuild, same as `chunk_text`).
 * `n_removed`/`n_tokens` make the removal auditable per document — the
 * corpus-level "how much boilerplate did we cut" number is one sum.
 *
 * ONE byte walk per document, zero shuffles: the gram set (mined by
 * [[graft.operators.TextRank.duplicatedNgrams]] or supplied by the
 * caller) ships as a TorrentBroadcast of byte arrays — a task
 * serializes ~100 bytes, the set crosses the wire once per executor
 * ([[BroadcastArrayData]]'s transport argument), and the probe table
 * (FNV-1a open addressing, [[BlocklistStats]]'s scheme) is built once
 * per executor behind a soft reference. Each document then pays
 * O(tokens · n) hashing — every n-token window is hashed and probed
 * against the set — with byte-exact compare on hit, so a hash
 * collision can never remove a clean span.
 *
 * Window contract mirrors [[DistinctNgrams]] exactly (the miner and
 * the remover MUST agree on what a gram is): tokens are maximal
 * non-`\s` byte runs under the pinned Java ASCII `\s` set
 * {0x09..0x0D, 0x20}, empties dropped; windows are the `max(1,
 * tokens−n+1)` starts of `n` consecutive tokens, the last one
 * truncated at the document end; a document with 1 ≤ tokens < `n` has
 * ONE whole-sequence window (the `Shingling` short-document rule), so
 * a short document that IS a duplicated gram empties out. Gram bytes
 * are the window's tokens joined by single 0x20 — since tokens contain
 * no whitespace, the byte string determines the token sequence
 * uniquely, and a k<n-token gram can never alias an n-token window.
 * NULL text → NULL struct; 0 tokens → ("", 0, 0).
 */
case class RemoveDupSpans(child: Expression, n: Int,
                          bc: Broadcast[Array[Array[Byte]]]) extends UnaryExpression {
  require(n > 0, s"remove_dup_spans: n must be positive, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  // the probe table is executor-lifetime state keyed by broadcast id
  // (a fresh BatchAcc-style per-task build would pay O(|grams|) per
  // task); soft-referenced so memory pressure can reclaim it
  @transient private lazy val table: RemoveDupSpans.Table =
    RemoveDupSpans.tableFor(bc)

  @inline private def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)

  def compute(u: UTF8String): GenericInternalRow = {
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
    if (nTok == 0)
      return new GenericInternalRow(Array[Any](UTF8String.EMPTY_UTF8, 0, 0))

    val t = table
    val covered = new Array[Boolean](nTok)
    val nWins = math.max(1, nTok - n + 1)
    var g = 0
    while (g < nWins) {
      val e = math.min(g + n, nTok)
      // FNV-1a over the window's bytes-with-single-space form, straight
      // from the document buffer — no gram string is ever materialized
      var h = -2128831035
      var tk = g
      while (tk < e) {
        if (tk > g) h = (h ^ 0x20) * 16777619
        val o = offs(tk); val l = lens(tk)
        var j = 0
        while (j < l) { h = (h ^ (a(o + j) & 0xff)) * 16777619; j += 1 }
        tk += 1
      }
      var p = h & t.mask
      var done = false
      while (!done) {
        val gb = t.slots(p)
        if (gb == null) done = true
        else if (t.hashes(p) == h && windowEquals(gb, a, offs, lens, g, e)) {
          var c = g
          while (c < e) { covered(c) = true; c += 1 }
          done = true
        } else p = (p + 1) & t.mask
      }
      g += 1
    }

    var removed = 0
    var outLen = 0
    i = 0
    while (i < nTok) {
      if (covered(i)) removed += 1
      else outLen += lens(i) + 1 // +1 separator; one extra for the first
      i += 1
    }
    if (removed == nTok)
      return new GenericInternalRow(Array[Any](UTF8String.EMPTY_UTF8, removed, nTok))
    val out = new Array[Byte](outLen - 1)
    var p = 0
    i = 0
    while (i < nTok) {
      if (!covered(i)) {
        if (p > 0) { out(p) = 0x20; p += 1 }
        System.arraycopy(a, offs(i), out, p, lens(i))
        p += lens(i)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(out), removed, nTok))
  }

  /** gram bytes == window tokens joined by single 0x20, compared in
    * place (the hash matched; this is the collision screen). */
  private def windowEquals(gb: Array[Byte], a: Array[Byte],
                           offs: Array[Int], lens: Array[Int], g: Int, e: Int): Boolean = {
    var need = e - g - 1
    var tk = g
    while (tk < e) { need += lens(tk); tk += 1 }
    if (gb.length != need) return false
    var p = 0
    tk = g
    while (tk < e) {
      if (tk > g) { if (gb(p) != 0x20) return false; p += 1 }
      val o = offs(tk); val l = lens(tk)
      var j = 0
      while (j < l) { if (gb(p) != a(o + j)) return false; p += 1; j += 1 }
      tk += 1
    }
    true
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[RemoveDupSpans].getName
    val ref = ctx.addReferenceObj("removeDupSpans", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RemoveDupSpans =
    copy(child = newChild)
  override def prettyName: String = "remove_dup_spans"
  // broadcast handles must never print their value (driver plan strings
  // AND executor logs render tree nodes) — same rule as BroadcastArrayData
  override def toString: String = s"remove_dup_spans(${child.toString}, n=$n, grams=#${bc.id})"
}

object RemoveDupSpans {
  private[functions] final class Table(val slots: Array[Array[Byte]],
                                       val hashes: Array[Int], val mask: Int)

  // executor-lifetime probe-table cache keyed by broadcast id;
  // SoftReference values so a dropped pipeline's table is GC-reclaimable
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.ref.SoftReference[Table]]()

  private[functions] def tableFor(bc: Broadcast[Array[Array[Byte]]]): Table = {
    val ref = cache.get(bc.id)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) return hit
    val built = build(bc.value)
    cache.put(bc.id, new java.lang.ref.SoftReference(built))
    built
  }

  private def build(grams: Array[Array[Byte]]): Table = {
    var cap = 16
    while (cap < grams.length * 2) cap <<= 1
    val sl = new Array[Array[Byte]](cap)
    val hs = new Array[Int](cap)
    val m = cap - 1
    grams.foreach { gb =>
      var h = -2128831035
      var i = 0
      while (i < gb.length) { h = (h ^ (gb(i) & 0xff)) * 16777619; i += 1 }
      var s = h & m
      while (sl(s) != null && !java.util.Arrays.equals(sl(s), gb)) s = (s + 1) & m
      sl(s) = gb; hs(s) = h
    }
    new Table(sl, hs, m)
  }
}
