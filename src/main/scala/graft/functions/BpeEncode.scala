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
 * The merge list ships once as a broadcast; each executor INTERNS the
 * table once — every symbol (left, right, product) gets an int id and
 * the pair → rank probe is an open-addressed long table keyed by
 * `(leftId << 32) | rightId` — soft-cached by broadcast id (the
 * [[LmScore]] scheme). Per word the hot loop touches only int arrays:
 * each adjacent pair is ONE long hash probe (no tuple, no string
 * compare, no allocation), and each round applies the lowest present
 * rank at or above the ascending floor, so a 30k-merge production
 * table costs what the word needs, not what the table holds. A symbol outside the trained vocab
 * (id −1) can never merge and flows straight through to emission.
 * Encoding is one scan, no shuffle, no UDF serialization.
 */
case class BpeEncode(child: Expression, bc: Broadcast[Array[(String, String)]],
                     vocabBc: Option[Broadcast[Array[String]]] = None)
    extends UnaryExpression {

  private def emitIds: Boolean = vocabBc.isDefined
  override def dataType: DataType =
    if (emitIds) ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  @transient private lazy val tables: BpeEncode.Tables = BpeEncode.tablesFor(bc)

  /** token string → vocab id: alphabet first (given order), then merge
    * products at |A|+rank, first id winning a repeated product string;
    * built per plan instance (O(vocab), far off the hot path). */
  @transient private lazy val vocabIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    val alpha = vocabBc.get.value
    var i = 0
    while (i < alpha.length) { m.putIfAbsent(alpha(i), Integer.valueOf(i)); i += 1 }
    val merges = bc.value
    var r = 0
    while (r < merges.length) {
      m.putIfAbsent(merges(r)._1 + merges(r)._2, Integer.valueOf(alpha.length + r))
      r += 1
    }
    m
  }

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
    if (!emitIds) new GenericArrayData(out.toArray[Any])
    else {
      val ids = new Array[Any](out.length)
      val vm = vocabIds
      var k = 0
      while (k < out.length) {
        val got = vm.get(out(k).toString)
        ids(k) = if (got == null) Integer.valueOf(-1) else got
        k += 1
      }
      new GenericArrayData(ids)
    }
  }

  private def encodeWord(text: String, from: Int, until: Int,
                         out: mutable.ArrayBuffer[UTF8String]): Unit = {
    val t = tables
    // split to code points: parallel (id, string) arrays — the string
    // survives for emission of never-merged unknown symbols
    var len = 0
    var ids = new Array[Int](until - from)
    var toks = new Array[String](until - from)
    var i = from
    while (i < until) {
      val cp = text.codePointAt(i)
      val s = new String(Character.toChars(cp))
      ids(len) = t.idOf(s)
      toks(len) = s
      len += 1
      i += Character.charCount(cp)
    }
    // STRICT single ascending replay (the trainer's, the q105/q106
    // oracle's, and the spec reference's contract): each rank is
    // considered exactly once in increasing order, so a pair re-created
    // by a LATER merge's product — the (a,bc)/(ab,c) → abc family q111
    // supports — is NOT re-merged. Implemented as "lowest present rank
    // ≥ floor", floor = last applied rank + 1: equivalent to replaying
    // ranks 0..R−1 one by one, without the O(R·len) full sweep.
    var floor = 0
    var done = len < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j + 1 < len) {
        val a = ids(j); val b = ids(j + 1)
        if (a >= 0 && b >= 0) {
          val rk = t.rankOf(a, b)
          if (rk >= floor && rk < bestRank) bestRank = rk
        }
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        floor = bestRank + 1
        val lId = t.leftId(bestRank)
        val rId = t.rightId(bestRank)
        val pId = t.productId(bestRank)
        val pStr = t.symbol(pId)
        var w = 0
        j = 0
        while (j < len) {
          if (j + 1 < len && ids(j) == lId && ids(j + 1) == rId) {
            ids(w) = pId; toks(w) = pStr; w += 1; j += 2
          } else { ids(w) = ids(j); toks(w) = toks(j); w += 1; j += 1 }
        }
        len = w
        if (len < 2) done = true
      }
    }
    var k = 0
    while (k < len) { out += UTF8String.fromString(toks(k)); k += 1 }
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

  /** The interned probe tables: symbol strings ↔ int ids, per-rank
    * (left, right, product) id triples, and an open-addressed
    * `(l << 32 | r) → rank` long table (first rank wins on a repeated
    * pair — the trainer never emits one, but the contract is pinned). */
  private[functions] final class Tables(merges: Array[(String, String)]) {
    private val vocab = new java.util.HashMap[String, Integer](merges.length * 4)
    private val syms = new mutable.ArrayBuffer[String](merges.length * 3)
    private def intern(s: String): Int = {
      val got = vocab.get(s)
      if (got != null) got.intValue()
      else { val id = syms.length; syms += s; vocab.put(s, id); id }
    }
    val leftId = new Array[Int](merges.length)
    val rightId = new Array[Int](merges.length)
    val productId = new Array[Int](merges.length)
    private val cap = {
      var c = 16
      while (c < merges.length * 2 + 1) c <<= 1
      c
    }
    private val mask = cap - 1
    private val probeKey = new Array[Long](cap)
    private val probeVal = new Array[Int](cap)
    java.util.Arrays.fill(probeVal, -1)
    private def put(key: Long, rank: Int): Unit = {
      var idx = (java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L)) & mask
      while (probeVal(idx) >= 0 && probeKey(idx) != key) idx = (idx + 1) & mask
      if (probeVal(idx) < 0) { probeKey(idx) = key; probeVal(idx) = rank }
      // else: the pair already holds its FIRST (lowest) rank
    }
    locally {
      var i = 0
      while (i < merges.length) {
        val (l, r) = merges(i)
        leftId(i) = intern(l)
        rightId(i) = intern(r)
        productId(i) = intern(l + r)
        put((leftId(i).toLong << 32) | (rightId(i).toLong & 0xFFFFFFFFL), i)
        i += 1
      }
    }
    private val symArr = syms.toArray

    def idOf(s: String): Int = {
      val got = vocab.get(s)
      if (got == null) -1 else got.intValue()
    }
    def symbol(id: Int): String = symArr(id)
    def rankOf(l: Int, r: Int): Int = {
      val key = (l.toLong << 32) | (r.toLong & 0xFFFFFFFFL)
      var idx = (java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L)) & mask
      while (true) {
        val v = probeVal(idx)
        if (v < 0) return -1
        if (probeKey(idx) == key) return v
        idx = (idx + 1) & mask
      }
      -1
    }
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    Long, java.lang.ref.SoftReference[Tables]]()

  private[functions] def tablesFor(bc: Broadcast[Array[(String, String)]]): Tables = {
    val ref = cache.get(bc.id)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) return hit
    // GC cleared the SoftReference contents but the map keys stayed —
    // a long-lived session encoding with many models would accumulate
    // dead entries forever. Sweep them on the (rare) build path.
    val it = cache.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue.get() == null) it.remove()
    val built = new Tables(bc.value)
    cache.put(bc.id, new java.lang.ref.SoftReference(built))
    built
  }
}
