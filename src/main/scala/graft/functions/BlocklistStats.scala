package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `blocklist_stats(text, terms…)` → STRUCT<n_matched INT, n_tokens INT>
 * in ONE byte walk: how many of the document's whitespace tokens are in
 * the term SET, and how many tokens there are — the two numbers a
 * filter-list pass needs (drop on any hit, or threshold on the
 * matched-token RATIO, the standard "obscenity density" quality
 * signal).
 *
 * [[TermCounts]] answers per-term questions for a HANDFUL of query
 * terms (O(|terms|) compare per token — right for BM25's 2-5 terms,
 * wrong for a filter list). This kernel answers the set-membership
 * question for THOUSANDS of terms at O(1) per token: the term set
 * compiles once per expression into an open-addressing hash table of
 * byte arrays (FNV-1a over the token's bytes, the same hash
 * [[TokenStats]] uses for its distinct set), and each token costs one
 * hash + one probe chain regardless of list size. At 100 TB with a
 * 10k-entry blocklist that is the difference between one scan and an
 * unusable regex alternation.
 *
 * Token contract: maximal non-whitespace byte runs under the library's
 * pinned Java-`\s` ASCII set, empty tokens dropped (a padding token
 * can't be blocked). Matching is exact bytes, hence case-sensitive —
 * blocklists that want folding pre-fold BOTH sides (locale-portable
 * folding is the caller's policy decision, not this kernel's).
 */
case class BlocklistStats(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty, "blocklist_stats needs at least one term")
  require(terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
    "blocklist terms must be non-empty single tokens")

  override def dataType: DataType = StructType(Seq(
    StructField("n_matched", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")

  // open-addressing table, built once per expression instance: slot i
  // holds a term's bytes (null = empty) with its FNV hash beside for
  // cheap probe rejection. Deduplicated — a term listed twice is one
  // entry, counts are per TOKEN not per list entry.
  @transient private lazy val (slots, hashes, mask) = {
    val uniq = terms.distinct.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var cap = 16
    while (cap < uniq.size * 2) cap <<= 1
    val sl = new Array[Array[Byte]](cap)
    val hs = new Array[Int](cap)
    val m = cap - 1
    uniq.foreach { tb =>
      var h = -2128831035 // FNV-1a offset basis (32-bit)
      var i = 0
      while (i < tb.length) { h = (h ^ (tb(i) & 0xff)) * 16777619; i += 1 }
      var s = h & m
      while (sl(s) != null && !java.util.Arrays.equals(sl(s), tb)) s = (s + 1) & m
      sl(s) = tb; hs(s) = h
    }
    (sl, hs, m)
  }

  def compute(u: UTF8String): GenericInternalRow = {
    val n = u.numBytes
    @inline def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)
    var tokens = 0
    var matched = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(u.getByte(i))) i += 1
      if (i < n) {
        val s = i
        var h = -2128831035
        while (i < n && !isWs(u.getByte(i))) {
          h = (h ^ (u.getByte(i) & 0xff)) * 16777619
          i += 1
        }
        val len = i - s
        tokens += 1
        // probe: hash reject first, byte compare into the same UTF8String
        var p = h & mask
        var hit = false
        var miss = false
        while (!hit && !miss) {
          val tb = slots(p)
          if (tb == null) miss = true
          else if (hashes(p) == h && tb.length == len) {
            var j = 0
            while (j < len && tb(j) == u.getByte(s + j)) j += 1
            if (j == len) hit = true else p = (p + 1) & mask
          } else p = (p + 1) & mask
        }
        if (hit) matched += 1
      }
    }
    new GenericInternalRow(Array[Any](matched, tokens))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BlocklistStats].getName
    val ref = ctx.addReferenceObj("blocklistStats", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistStats =
    copy(child = newChild)
  override def prettyName: String = "blocklist_stats"
}
