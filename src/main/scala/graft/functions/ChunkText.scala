package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `chunk_text(text, maxTokens, overlap)` → ARRAY<STRING> — token-budget
 * document chunking, the context-window prep step of a training-data
 * pipeline (long documents split into ≤`maxTokens`-token windows that
 * overlap by `overlap` tokens so no boundary context is lost). One
 * byte-level pass: tokenize, then assemble each window's bytes joined
 * by single spaces. Token semantics are EXACTLY the library's
 * `tokens()` convention (space-only trim, then split `\s+` keeping
 * leading/trailing empty tokens — the same whitespace contract
 * [[TokenStats]] pins), so a chunk equals
 * `array_to_string(list_slice(tokens, s, e), ' ')` in DuckDB and the
 * q82 oracle can recompute every window verbatim. Windows start at
 * 0, step = maxTokens − overlap, and emission stops once a window has
 * reached the end of the document (no redundant fully-contained tail
 * window). Empty/whitespace-only text (after the space-only trim) has
 * no chunks; NULL text is NULL.
 */
case class ChunkText(child: Expression, maxTokens: Int, overlap: Int)
  extends UnaryExpression {

  require(maxTokens > 0, s"chunk_text: maxTokens must be positive, got $maxTokens")
  require(overlap >= 0 && overlap < maxTokens,
    s"chunk_text: overlap ($overlap) must be in [0, maxTokens=$maxTokens)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  @inline private def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)

  /** The interpreted and generated paths share this kernel entry. */
  def compute(u: UTF8String): GenericArrayData = {
    val a = u.getBytes // one copy per document; slices below are arraycopy
    var b0 = 0
    var e0 = a.length
    // space-only trim, mirroring SQL trim()'s default
    while (b0 < e0 && a(b0) == 0x20) b0 += 1
    while (e0 > b0 && a(e0 - 1) == 0x20) e0 -= 1
    if (b0 == e0) return new GenericArrayData(Array.empty[Any])

    // token spans, split-\s+ semantics with limit -1: a leading
    // whitespace run yields a leading EMPTY token, a trailing run a
    // trailing empty token (both engines' split/string_split_regex do)
    var cap = 16
    var offs = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var nTok = 0
    def add(off: Int, len: Int): Unit = {
      if (nTok == cap) {
        cap <<= 1
        offs = java.util.Arrays.copyOf(offs, cap)
        lens = java.util.Arrays.copyOf(lens, cap)
      }
      offs(nTok) = off; lens(nTok) = len; nTok += 1
    }
    var i = b0
    if (isWs(a(i))) {
      add(i, 0)
      while (i < e0 && isWs(a(i))) i += 1
      if (i == e0) add(i, 0) // all-whitespace: ["", ""]
    }
    while (i < e0) {
      val start = i
      while (i < e0 && !isWs(a(i))) i += 1
      add(start, i - start)
      if (i < e0) {
        while (i < e0 && isWs(a(i))) i += 1
        if (i == e0) add(i, 0) // trailing whitespace run -> trailing empty token
      }
    }

    val step = maxTokens - overlap
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var s = 0
    var done = false
    while (!done) {
      val e = math.min(s + maxTokens, nTok)
      var bl = e - s - 1 // single-space separators
      var t = s
      while (t < e) { bl += lens(t); t += 1 }
      val bs = new Array[Byte](bl)
      var p = 0
      t = s
      while (t < e) {
        if (t > s) { bs(p) = 0x20; p += 1 }
        System.arraycopy(a, offs(t), bs, p, lens(t))
        p += lens(t)
        t += 1
      }
      out += UTF8String.fromBytes(bs)
      // stop once this window reached the document's end — a further
      // start would emit a window fully contained in this one
      done = s + maxTokens >= nTok
      s += step
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[ChunkText].getName
    val ref = ctx.addReferenceObj("chunkText", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
  override def prettyName: String = "chunk_text"
}
