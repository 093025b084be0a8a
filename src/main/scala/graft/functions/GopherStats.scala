package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `gopher_stats(text)` → STRUCT<n_tokens INT, n_token_chars INT,
 * n_alpha_tokens INT, n_stop_hits INT, n_symbols INT> — the word-level
 * inputs of the Gopher repetition-free quality rules (Rae et al.,
 * "Scaling Language Models: Methods, Analysis & Insights from Training
 * Gopher", 2021, Table A1) in ONE byte walk:
 *
 *  - `n_tokens` / `n_token_chars`: word count and summed token byte
 *    length (mean word length = chars/tokens; the 3..10 rule)
 *  - `n_alpha_tokens`: tokens containing at least one ASCII letter
 *    (the "80% of words must contain an alphabetic character" rule)
 *  - `n_stop_hits`: DISTINCT members of Gopher's canonical stopword
 *    octet {the, be, to, of, and, that, have, with} present (the
 *    "at least 2 stop words" rule) — an 8-bit mask, not a count of
 *    occurrences, folded at the end
 *  - `n_symbols`: `#` bytes plus non-overlapping `...` occurrences
 *    (the symbol-to-word ratio rule; non-overlapping left-to-right,
 *    exactly what a `replace`-based recount reproduces)
 *
 * The line-shaped Gopher rules (bullet-start / ellipsis-end fractions)
 * are line-granularity concerns and live with the line operators, not
 * this token kernel. Token contract: the library's pinned Java ASCII
 * `\s` runs, empties dropped, case-sensitive (fold first if wanted).
 * NULL text → NULL struct; the `...` scan runs over the RAW bytes, so
 * an ellipsis glued to a word still counts (it is punctuation density,
 * not a token property).
 */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_token_chars", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false),
    StructField("n_stop_hits", IntegerType, nullable = false),
    StructField("n_symbols", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  @inline private def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)
  @inline private def isAlpha(x: Byte): Boolean =
    (x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z')

  def compute(u: UTF8String): GenericInternalRow = {
    val a = u.getBytes
    val len = a.length
    var nTok = 0
    var nChars = 0
    var nAlpha = 0
    var stopMask = 0
    var nSym = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(a(i))) i += 1
      if (i < len) {
        val s = i
        var hasAlpha = false
        while (i < len && !isWs(a(i))) {
          if (isAlpha(a(i))) hasAlpha = true
          i += 1
        }
        val l = i - s
        nTok += 1
        nChars += l
        if (hasAlpha) nAlpha += 1
        stopMask |= GopherStats.stopBit(a, s, l)
      }
    }
    // symbol pass over the raw bytes: '#' anywhere; '...' non-overlapping
    i = 0
    while (i < len) {
      if (a(i) == '#') { nSym += 1; i += 1 }
      else if (a(i) == '.' && i + 2 < len && a(i + 1) == '.' && a(i + 2) == '.') {
        nSym += 1; i += 3
      } else i += 1
    }
    new GenericInternalRow(Array[Any](
      nTok, nChars, nAlpha, Integer.bitCount(stopMask), nSym))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[GopherStats].getName
    val ref = ctx.addReferenceObj("gopherStats", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
  override def prettyName: String = "gopher_stats"
}

object GopherStats {

  /** Gopher's canonical stop octet, bit i = word i. */
  val stopwords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  private val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Bit of the stopword the token byte-slice equals, else 0. Eight
    * fixed 2-5-byte compares — cheaper than any hash at this size. */
  private[functions] def stopBit(a: Array[Byte], off: Int, len: Int): Int = {
    if (len < 2 || len > 4) return 0
    var w = 0
    while (w < stopBytes.length) {
      val sb = stopBytes(w)
      if (sb.length == len) {
        var j = 0
        while (j < len && sb(j) == a(off + j)) j += 1
        if (j == len) return 1 << w
      }
      w += 1
    }
    0
  }
}
