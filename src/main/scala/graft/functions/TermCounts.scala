package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `term_counts(text, terms…)` → ARRAY<INT> of size |terms| + 1: the
 * exact whitespace-token occurrence count of each query term, plus the
 * document's total (non-empty) token count in the LAST slot — the
 * entire per-document input of a BM25 pass fused into ONE byte walk.
 *
 * The compositional form (`split` → `filter` → `explode` → `isin` →
 * two groupBys) materializes a token ARRAY per document, explodes it
 * to a row per token, and shuffles the hits — measured 30.2 s on the
 * 550k-doc sf10 tier vs DuckDB's 9.4 s for the same query. This kernel
 * walks the UTF-8 bytes once (no decode, no array, no generator, no
 * shuffle before the per-document aggregate): each token span is
 * length-and-byte compared against the query terms (a handful — BM25
 * queries are short; the scan is O(bytes + hits·termLen)).
 *
 * Token contract: maximal runs of non-`\s` bytes, Java's ASCII `\s`
 * = {0x09..0x0D, 0x20} (the library's pinned whitespace set — none of
 * those bytes can be a UTF-8 continuation byte, so byte-splitting is
 * exact), empty tokens dropped — term STATISTICS must not count
 * padding, unlike the chunking contract which must reproduce
 * `split(-1)` verbatim. Matching is exact bytes, hence case-sensitive:
 * engine-portable case folding is locale-dependent, so callers fold
 * both sides explicitly if they want it.
 */
case class TermCounts(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty, "term_counts needs at least one term")
  require(terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
    "terms must be non-empty single tokens")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  // first-byte dispatch: most tokens fail on the first byte without
  // touching any term's tail
  @transient private lazy val firstBytes: Array[Byte] = termBytes.map(_(0))

  def compute(u: UTF8String): GenericArrayData = {
    val nTerms = termBytes.length
    val counts = new Array[Int](nTerms + 1)
    val n = u.numBytes
    @inline def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)
    var i = 0
    while (i < n) {
      while (i < n && isWs(u.getByte(i))) i += 1
      if (i < n) {
        val s = i
        val b0 = u.getByte(i)
        while (i < n && !isWs(u.getByte(i))) i += 1
        val len = i - s
        counts(nTerms) += 1
        var t = 0
        while (t < nTerms) {
          if (firstBytes(t) == b0 && termBytes(t).length == len) {
            val tb = termBytes(t)
            var j = 1
            while (j < len && tb(j) == u.getByte(s + j)) j += 1
            if (j == len) counts(t) += 1
          }
          t += 1
        }
      }
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[TermCounts].getName
    val ref = ctx.addReferenceObj("termCounts", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
  override def prettyName: String = "term_counts"
}
