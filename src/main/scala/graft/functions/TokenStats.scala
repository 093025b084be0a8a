package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `token_stats(text)` → STRUCT<n_tokens INT, n_distinct INT,
 * n_chars INT, n_punct INT> in ONE pass over the string — the fused
 * form of the per-document text-statistics tuple
 * (`size(tokens(text))`, `size(array_distinct(tokens(text)))`,
 * `length(text)`, `size(regexp_extract_all(text, "[^A-Za-z0-9\\s]"))`),
 * which as separate Column expressions tokenizes the SAME text twice,
 * materializes the token array once more for `array_distinct`'s hash
 * pass, and runs a regex engine that MATERIALIZES every punctuation
 * match just to count them (the quality-score path measured 23.6 s at
 * sf10 vs this kernel's 2.4 s). At 500k docs (the sf10 tier) the
 * unfused q10 ran 2.9× DuckDB's vectorized string kernels; one
 * tokenize + one hash-set membership pass per document is the fix.
 *
 * Bit-for-bit parity with the unfused expressions (the q10 oracle is
 * hash-checked):
 *  - `n_chars` = code-point count of the ORIGINAL text (Spark `length`)
 *  - trimming removes ASCII 0x20 only (Spark `trim`), NOT Java's
 *    `String.trim` ≤0x20 range
 *  - empty-after-trim → (0, 0, n_chars) (the `tokens()` empty guard)
 *  - otherwise Java `Pattern("\\s+").split(trimmed, -1)` — Spark's
 *    `split` limit −1 semantics, KEEPING the leading empty token when
 *    the trimmed text starts with non-space whitespace and trailing
 *    empties after a non-space-whitespace tail
 *  - distinct = exact string equality (a hashed sketch could collide
 *    and silently shave a count — the oracle would catch it, so don't)
 *
 * Codegen delegates the loop to [[compute]] via a reference object —
 * one virtual call per row keeps the surrounding stage inside
 * whole-stage codegen without inlining a regex engine into Janino.
 */
case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")

  /** The whole computation runs on the UTF-8 BYTES — no `toString`
    * decode, no regex, no token `String[]`, no `HashSet<String>`:
    *
    *  - `n_chars` = `UTF8String.numChars` — the SAME function Spark's
    *    `length` calls, so parity holds by construction.
    *  - Java regex `\s` without `UNICODE_CHARACTER_CLASS` is exactly
    *    the ASCII set {0x09..0x0D, 0x20}; none of those bytes can be a
    *    UTF-8 continuation byte, so splitting on byte runs reproduces
    *    `Pattern("\\s+").split(trimmed, -1)` — including the leading
    *    empty token after a non-space-whitespace head and the single
    *    trailing empty token after a whitespace tail.
    *  - distinct = exact BYTE equality of token slices, which equals
    *    string equality for (valid) UTF-8; the empty token is tracked
    *    as a flag, every other token goes through an open-addressing
    *    set of (offset, len) slices with stored hashes (per-thread
    *    scratch — the expression object is shared across local-mode
    *    task threads).
    *
    * Byte-level rewrite measured 11.0 → 6.1 s on `sf10_text_stats`
    * (DuckDB 9.8 s on the same box — the row flips from 1.17× to
    * 0.62×; BENCH_CONTEXT round 14): the original decoded ~2 GB of
    * document text to java Strings and allocated a String per token,
    * per row. */
  def compute(u: UTF8String): InternalRow = {
    val nChars = u.numChars()
    val n = u.numBytes
    // n_punct = count of code points outside [A-Za-z0-9] ∪ ASCII-\s over
    // the WHOLE raw text (regexp_extract_all's negated class, Java
    // default flags: \s is ASCII-only, classes match per CODE POINT —
    // an astral emoji is ONE match; every non-ASCII code point is
    // outside the class). Lead-byte walk: ASCII bytes classify directly,
    // multi-byte lead bytes (0xC0-0xFF) count one punct, continuation
    // bytes (0x80-0xBF) are skipped.
    var punct = 0
    var p = 0
    while (p < n) {
      val x = u.getByte(p)
      if (x >= 0) {
        val alnumOrWs = (x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z') ||
          (x >= '0' && x <= '9') || x == 0x20 || (x >= 0x09 && x <= 0x0D)
        if (!alnumOrWs) punct += 1
      } else if ((x & 0xC0) == 0xC0) punct += 1
      p += 1
    }
    var b = 0
    var e = n
    // Spark trim(): ASCII space only
    while (b < e && u.getByte(b) == 0x20) b += 1
    while (e > b && u.getByte(e - 1) == 0x20) e -= 1
    if (b == e) return new GenericInternalRow(Array[Any](0, 0, nChars, punct))

    @inline def isWs(x: Byte): Boolean = x == 0x20 || (x >= 0x09 && x <= 0x0D)
    val set = TokenStats.scratch.get()
    set.reset()
    var tokens = 0
    var distinct = 0
    var sawEmpty = false
    var i = b
    if (isWs(u.getByte(i))) { // leading whitespace run -> leading empty token
      tokens += 1; sawEmpty = true
      while (i < e && isWs(u.getByte(i))) i += 1
      if (i == e) tokens += 1 // all-whitespace: split("\t", -1) == ["", ""]
    }
    while (i < e) {
      val start = i
      var h = -2128831035 // FNV-1a over the token's bytes
      while (i < e && !isWs(u.getByte(i))) { h = (h ^ (u.getByte(i) & 0xff)) * 16777619; i += 1 }
      tokens += 1
      if (set.add(u, start, i - start, h)) distinct += 1
      if (i < e) {
        while (i < e && isWs(u.getByte(i))) i += 1
        if (i == e) { tokens += 1; sawEmpty = true } // trailing empty under limit -1
      }
    }
    if (sawEmpty) distinct += 1
    new GenericInternalRow(Array[Any](tokens, distinct, nChars, punct))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[TokenStats].getName
    val ref = ctx.addReferenceObj("tokenStats", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) (($cls) $ref).compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "token_stats"
}

object TokenStats {
  /** Open-addressing set of token byte-slices within ONE document:
    * entries are (offset+1)<<32 | len packed into a long (offset+1 so 0
    * means empty slot), with the FNV hash stored beside for cheap
    * probe rejection; equality falls back to a byte compare into the
    * SAME UTF8String. Per-thread (the expression object is shared
    * across tasks); `reset` clears only the touched slots, so short
    * documents don't pay a full-table memset. */
  private[functions] final class SliceSet {
    private var cap = 1024
    private var mask = cap - 1
    private var slots = new Array[Long](cap)
    private var hashes = new Array[Int](cap)
    private var touched = new Array[Int](512)
    private var nTouched = 0
    private var size = 0

    def reset(): Unit = {
      var i = 0
      while (i < nTouched) { slots(touched(i)) = 0L; i += 1 }
      nTouched = 0
      size = 0
    }

    private def grow(u: UTF8String): Unit = {
      val oldSlots = slots; val oldHashes = hashes
      cap <<= 1; mask = cap - 1
      slots = new Array[Long](cap); hashes = new Array[Int](cap)
      val oldTouched = touched; val oldN = nTouched
      touched = new Array[Int](math.max(cap / 2, oldTouched.length))
      nTouched = 0
      var i = 0
      while (i < oldN) {
        val s = oldSlots(oldTouched(i))
        if (s != 0L) { // re-insert without equality checks (all distinct)
          var j = oldHashes(oldTouched(i)) & mask
          while (slots(j) != 0L) j = (j + 1) & mask
          slots(j) = s; hashes(j) = oldHashes(oldTouched(i))
          touched(nTouched) = j; nTouched += 1
        }
        i += 1
      }
    }

    /** True when the slice was NOT seen before in this document. */
    def add(u: UTF8String, off: Int, len: Int, hash: Int): Boolean = {
      if ((size + 1) * 2 > cap) grow(u)
      var j = hash & mask
      while (true) {
        val s = slots(j)
        if (s == 0L) {
          slots(j) = ((off + 1).toLong << 32) | (len & 0xffffffffL)
          hashes(j) = hash
          if (nTouched == touched.length) touched = java.util.Arrays.copyOf(touched, nTouched * 2)
          touched(nTouched) = j; nTouched += 1
          size += 1
          return true
        }
        if (hashes(j) == hash) {
          val so = (s >>> 32).toInt - 1
          val sl = s.toInt
          if (sl == len) {
            var k = 0
            while (k < len && u.getByte(so + k) == u.getByte(off + k)) k += 1
            if (k == len) return false
          }
        }
        j = (j + 1) & mask
      }
      false // unreachable
    }
  }

  private val scratch = new ThreadLocal[SliceSet] {
    override def initialValue(): SliceSet = new SliceSet
  }
}
