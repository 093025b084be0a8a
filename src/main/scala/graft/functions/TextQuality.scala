package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused byte-level language-ID and stopword-ratio kernels. The original
 * Column formulations (`tokens(lower(text))` + one interpreted
 * higher-order `filter(array_contains…)` per language) measured 81 s
 * (lang_id) and 18.5 s (stopword_ratio) over the 550k-doc sf10 tier vs
 * a 0.7 s scan floor — the HOF lambdas are CodegenFallback and the
 * token array is materialized once per language. These expressions run
 * the shared [[Shingling.lowerAndTokenize]] byte walk once and count
 * stopword hits through a tiny static open-addressing table mapping
 * token byte-slices to a language bitmask (ShinglingTextSpec-style
 * parity is pinned by TextQualitySpec against the original Column
 * formulas, which remain constructible).
 */
private[graft] object TextQuality {
  /** Language codes in sorted order — the SAME order the Column
    * formulation builds its struct array in, so index tie-breaks
    * reproduce `array_max`'s (score, lang) lexicographic max. */
  val langs: Array[String] = TextFunctions.stopwordsByLang.keys.toArray.sorted
  private val langIndex: Map[String, Int] = langs.zipWithIndex.toMap
  val nLangs: Int = langs.length
  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)
  private[functions] val und = UTF8String.fromString("und")

  // static open-addressing table: word bytes -> bitmask of languages
  private val tblCap = 256 // 61 distinct words, load < 25%
  private val tblMaskBits = tblCap - 1
  private val tblWords = new Array[Array[Byte]](tblCap)
  private val tblMasks = new Array[Int](tblCap)
  private val tblHashes = new Array[Int](tblCap)
  private var maxWordLen = 0
  locally {
    for ((lang, words) <- TextFunctions.stopwordsByLang; w <- words) {
      val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      maxWordLen = math.max(maxWordLen, bytes.length)
      val h = fnv(bytes)
      var j = h & tblMaskBits
      var placed = false
      while (!placed) {
        if (tblWords(j) == null) {
          tblWords(j) = bytes; tblHashes(j) = h
          tblMasks(j) = 1 << langIndex(lang)
          placed = true
        } else if (java.util.Arrays.equals(tblWords(j), bytes)) {
          tblMasks(j) |= 1 << langIndex(lang)
          placed = true
        } else j = (j + 1) & tblMaskBits
      }
    }
  }

  private def fnv(bytes: Array[Byte]): Int = {
    var h = -2128831035
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 16777619; i += 1 }
    h
  }

  /** Language bitmask of the token byte-slice (0 when not a stopword). */
  @inline def lookup(a: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0 || len > maxWordLen) return 0
    var h = -2128831035
    var i = off
    val e = off + len
    while (i < e) { h = (h ^ (a(i) & 0xff)) * 16777619; i += 1 }
    var j = h & tblMaskBits
    while (true) {
      val w = tblWords(j)
      if (w == null) return 0
      if (tblHashes(j) == h && w.length == len) {
        var k = 0
        while (k < len && w(k) == a(off + k)) k += 1
        if (k == len) return tblMasks(j)
      }
      j = (j + 1) & tblMaskBits
    }
    0 // unreachable
  }

  private val countScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](nLangs)
  }

  /** One tokenize walk; fills the per-thread per-language hit counters.
    * Returns (counters, nTok). */
  def countHits(u: UTF8String): (Array[Int], Int) = {
    val sc = Shingling.lowerAndTokenize(u)
    val counts = countScratch.get()
    java.util.Arrays.fill(counts, 0)
    val a = sc.view
    var t = 0
    while (t < sc.nTok) {
      val m = lookup(a, sc.offs(t), sc.lens(t))
      if (m != 0) {
        var k = 0
        var mm = m
        while (mm != 0) { if ((mm & 1) != 0) counts(k) += 1; mm >>>= 1; k += 1 }
      }
      t += 1
    }
    (counts, sc.nTok)
  }

  def bestLang(counts: Array[Int]): UTF8String = {
    var best = 0
    var bestK = 0
    var k = 0
    while (k < nLangs) {
      // >= : on a score tie the LARGER lang code wins, matching
      // array_max's (score, lang) struct comparison over the sorted codes
      if (counts(k) >= best) { best = counts(k); bestK = k }
      k += 1
    }
    if (best > 0) langU8(bestK) else und
  }
}

/** `lang_id(text)` → 'de'|'en'|'es'|'fr'|'it'|'und' — the stopword-hit
  * language heuristic as ONE byte-level pass (81 s → scan-floor at
  * sf10; the q13 oracle replicates the tables and tie-break in SQL).
  * Codegen emits one instance-method call (the TokenStats pattern), so
  * a projection mixing this with other expressions keeps whole-stage
  * codegen — the kernel itself is the same tight byte walk either way. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // NULL text → 'und', NOT NULL: the Column formulation this replaces
  // ends in when(best.score > 0, lang).otherwise('und'), and a NULL
  // score falls through to the otherwise branch (TextQualitySpec pins it)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  /** The interpreted and generated paths share this kernel entry. */
  def evalLang(u: UTF8String): UTF8String = {
    val (counts, _) = TextQuality.countHits(u)
    TextQuality.bestLang(counts)
  }
  def undValue(): UTF8String = TextQuality.und

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextQuality.und else evalLang(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[LangId].getName
    val ref = ctx.addReferenceObj("langId", this, cls)
    val childGen = child.genCode(ctx)
    // non-nullable output: a NULL input maps to 'und', so the result
    // carries no isNull flag of its own
    val resultCode =
      s"""
         |${childGen.code}
         |UTF8String ${ev.value} = ${childGen.isNull}
         |  ? (($cls) $ref).undValue() : (($cls) $ref).evalLang(${childGen.value});
       """.stripMargin
    ev.copy(code = code"$resultCode", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

/** `stopword_ratio(text, 'en')` → stopword hits / token count (0.0 for
  * an empty token array) — same one-pass kernel, one language. Codegen
  * emits one instance-method call, keeping mixed projections inside
  * whole-stage codegen. */
case class StopwordRatio(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects STRING text, got ${left.dataType}")
    if (right.dataType != StringType || !right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a literal language code, got ${right.sql}")
    val lang = Option(right.eval()).map(_.toString).orNull
    if (lang == null || !TextQuality.langs.contains(lang))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unsupported language '$lang' (have ${TextQuality.langs.mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val langIdx: Int =
    TextQuality.langs.indexOf(right.eval().toString)

  /** The interpreted and generated paths share this kernel entry. */
  def evalRatio(t: UTF8String): Double = {
    val (counts, nTok) = TextQuality.countHits(t)
    if (nTok == 0) 0.0 else counts(langIdx).toDouble / nTok
  }

  override def nullSafeEval(t: Any, l: Any): Any =
    evalRatio(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[StopwordRatio].getName
    val ref = ctx.addReferenceObj("stopwordRatio", this, cls)
    // the language operand is a validated foldable literal (analysis
    // rejects anything else); only the text child feeds the kernel
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = (($cls) $ref).evalRatio($t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): StopwordRatio =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "stopword_ratio"
}
