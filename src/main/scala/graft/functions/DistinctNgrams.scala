package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `distinct_ngrams(text, n)` → ARRAY<STRING> — the document's DISTINCT
 * word `n`-grams (space-joined, first-occurrence order), fused into one
 * byte walk. This is the per-document input of cross-corpus duplicated
 * n-gram mining (boilerplate detection, blocklist construction, the
 * repeated-sequence analysis behind exact-substring dedup): explode it
 * and count documents per gram, and the map-side partial aggregate sees
 * each document's grams exactly once — no `array_distinct` pass, no
 * token-array materialization, no regex split.
 *
 * Token contract: maximal runs of non-`\s` bytes, Java's ASCII `\s` =
 * {0x09..0x0D, 0x20} (the library's pinned whitespace set — none of
 * those bytes can be a UTF-8 continuation byte, so byte-splitting is
 * exact), empty tokens dropped, case preserved ([[TermCounts]]'s
 * statistics contract, not the chunking `split(-1)` one). A document
 * with 1 ≤ tokens < `n` yields its whole token sequence as ONE gram —
 * the same short-document rule as the library's `Shingling` hash
 * walker, so short duplicates still collide; 0 tokens yield an empty
 * array; NULL text is NULL. Reference workload shape: the duplicated
 * n-gram passes of training-corpus curation (Lee et al., "Deduplicating
 * Training Data Makes Language Models Better", ACL 2022) — mining only;
 * removal stays with `decontaminate`/dedup.
 */
case class DistinctNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"distinct_ngrams: n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  @inline private def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)

  /** The interpreted and generated paths share this kernel entry. */
  def compute(u: UTF8String): GenericArrayData = {
    val a = u.getBytes // one copy per document; gram assembly is arraycopy
    val len = a.length
    // token spans — empties dropped (no span is ever zero-length)
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
    if (nTok == 0) return new GenericArrayData(Array.empty[Any])

    // short documents: ONE whole-sequence gram (Shingling's rule)
    val nGrams = math.max(1, nTok - n + 1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](nGrams)
    // per-document dedup inline: UTF8String hashes/compares by bytes
    val seen = new java.util.HashSet[UTF8String](nGrams * 2)
    var g = 0
    while (g < nGrams) {
      val e = math.min(g + n, nTok)
      var bl = e - g - 1 // single-space separators
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
      val gram = UTF8String.fromBytes(bs)
      if (seen.add(gram)) out += gram
      g += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[DistinctNgrams].getName
    val ref = ctx.addReferenceObj("distinctNgrams", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctNgrams =
    copy(child = newChild)
  override def prettyName: String = "distinct_ngrams"
}
