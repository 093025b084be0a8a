package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/**
 * `bpe_encode(text)` → ARRAY<STRING> — tokenize a document with a
 * trained [[graft.operators.Bpe.BpeModel]]: whitespace-split words
 * (the pinned Java `\s` class), each word's code points replayed
 * through the merge list in ascending rank order with left-to-right
 * non-overlapping passes, token arrays concatenated in word order.
 * The ascending sweep is exact because a trained table only ever
 * consumes a merge-k product at ranks > k (see [[graft.operators.Bpe]]).
 *
 * The merge list ships once as a broadcast; each executor builds a
 * pair → rank hash probe from it once, soft-cached by broadcast id
 * (the [[LmScore]] scheme). Per word, only ranks actually PRESENT are
 * visited: the word's adjacent pairs probe the rank table and the
 * minimum present rank is applied next — O(len) probes per applied
 * merge instead of a numMerges-long replay, so a 30k-merge production
 * table costs what the word needs, not what the table holds. Encoding
 * is one scan, no shuffle, no UDF serialization.
 */
case class BpeEncode(child: Expression, bc: Broadcast[Array[(String, String)]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  @transient private lazy val ranks: mutable.HashMap[(String, String), Int] =
    BpeEncode.ranksFor(bc)

  def compute(u: UTF8String): ArrayData = {
    val text = u.toString
    val out = new mutable.ArrayBuffer[UTF8String]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && BpeEncode.isWs(text.charAt(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !BpeEncode.isWs(text.charAt(i))) i += 1
        encodeWord(text, s, i, out)
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(text: String, from: Int, until: Int,
                         out: mutable.ArrayBuffer[UTF8String]): Unit = {
    // split to code points
    var sym = new mutable.ArrayBuffer[String](until - from)
    var i = from
    while (i < until) {
      val cp = text.codePointAt(i)
      sym += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    val r = ranks
    val table = bc.value
    // apply the lowest present rank until none of the word's pairs is
    // in the table; within a rank, merge left-to-right non-overlapping
    var done = sym.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j + 1 < sym.length) {
        val rk = r.getOrElse((sym(j), sym(j + 1)), Int.MaxValue)
        if (rk < bestRank) bestRank = rk
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, rr) = table(bestRank)
        val merged = new mutable.ArrayBuffer[String](sym.length)
        j = 0
        while (j < sym.length) {
          if (j + 1 < sym.length && sym(j) == l && sym(j + 1) == rr) {
            merged += l + rr; j += 2
          } else { merged += sym(j); j += 1 }
        }
        sym = merged
        if (sym.length < 2) done = true
      }
    }
    sym.foreach(t => out += UTF8String.fromString(t))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BpeEncode].getName
    val ref = ctx.addReferenceObj("bpeEncode", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  @inline private[functions] def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    Long, java.lang.ref.SoftReference[mutable.HashMap[(String, String), Int]]]()

  private[functions] def ranksFor(bc: Broadcast[Array[(String, String)]])
      : mutable.HashMap[(String, String), Int] = {
    val ref = cache.get(bc.id)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) return hit
    val m = new mutable.HashMap[(String, String), Int]
    val arr = bc.value
    var i = 0
    while (i < arr.length) {
      // first (lowest) rank wins if a pair somehow repeats
      if (!m.contains(arr(i))) m.update(arr(i), i)
      i += 1
    }
    cache.put(bc.id, new java.lang.ref.SoftReference(m))
    m
  }
}
