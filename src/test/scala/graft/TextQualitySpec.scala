package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused byte-level text-quality kernels ([[graft.functions.LangId]],
  * [[graft.functions.StopwordRatio]], TokenStats.n_punct) must be
  * bit-identical to the Column formulations they replace — q12/q13 are
  * hash-checked oracles, so lowercase/trim/split/tie-break divergence is
  * a correctness bug. The originals are reconstructed HERE (interpreted
  * HOF filters, regexp_extract_all) and compared on adversarial +
  * seeded-random + real corpora. */
class TextQualitySpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  // === the ORIGINAL formulations, verbatim ===
  private def tokensOf(text: org.apache.spark.sql.Column) = TextFunctions.tokens(text)
  private val stopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with", "as"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que", "des", "du"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "para", "en", "que", "de"),
    "it" -> Seq("il", "lo", "la", "e", "è", "un", "una", "per", "che", "di", "non", "con"))
  private def origStopwordRatio(text: org.apache.spark.sql.Column, lang: String) = {
    val sw = typedLit(stopwordsByLang(lang))
    val t = tokensOf(lower(text))
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, w => array_contains(sw, w))).cast("double") / size(t))
  }
  private def origLangId(text: org.apache.spark.sql.Column) = {
    val t = tokensOf(lower(text))
    val scored = stopwordsByLang.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(t, w => array_contains(typedLit(words), w))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
  private def origPunctRatio(text: org.apache.spark.sql.Column) =
    when(length(text) === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") / length(text))
  private def origDistinctTokenRatio(text: org.apache.spark.sql.Column) = {
    val t = tokensOf(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(array_distinct(t)).cast("double") / size(t))
  }
  private def origQualityRaw(text: org.apache.spark.sql.Column) = {
    val lenScore = least(lit(1.0), length(text).cast("double") / 500.0)
    lenScore * origDistinctTokenRatio(text) * greatest(lit(0.0), lit(1.0) - origPunctRatio(text) * 4.0)
  }

  private def adversarial: Seq[(Long, String)] = Seq(
    1L -> "the cat and the hat is on the mat",          // en
    2L -> "der hund und die katze mit für",             // de
    3L -> "le chat est dans la maison pour que",        // fr
    4L -> "el perro y la casa para los que",            // es
    5L -> "il gatto e la casa per che è non",           // it
    6L -> "la la la",                                   // fr/es/it tie -> largest code wins
    7L -> "un una",                                     // es/fr/it overlap
    8L -> "de la",                                      // es 'de' + 3-way 'la'
    9L -> "xyzzy plugh nothing matches here",           // und
    10L -> "",                                          // empty
    11L -> "   ",                                       // space-only
    12L -> "\t",                                        // ws-only, not space
    13L -> "THE The tHe tHE tie case FOLD",             // case folding into stopwords
    14L -> "punct!!! ... ??? ,,, ;;; :::",              // heavy punctuation
    15L -> "ünïcodé 😀 中文 ß İ Σ τελος ΤΕΛΟΣ",        // non-ASCII: every cp is punct
    16L -> "mixed the und le el il one-token-each",     // 5-way single-hit tie
    17L -> "  the  and  ",                              // stopwords inside trimmed spaces
    18L -> "\tthe and\t",                               // empty tokens in the denominator
    19L -> ("the " * 300).trim,                         // long, beyond len saturation
    20L -> "a1b2c3 1234 alnum only",
    21L -> null.asInstanceOf[String])

  private def fuzz(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val words = (stopwordsByLang.values.flatten.toSeq.distinct ++ Seq(
      "xyz", "THE", "Und", "LA", "è", "É", "FÜR", "σ", "Σx9", "中", "😀",
      "a!b", ".", ",", "", " ", "\t", "\n", "word", "123", "x")).toArray
    (0 until n).map { i =>
      val len = rnd.nextInt(30)
      (5000L + i, (0 until len).map(_ => words(rnd.nextInt(words.length)))
        .mkString(if (rnd.nextBoolean()) " " else "\t"))
    }
  }

  private def assertParity(rows: Seq[(Long, String)]): Unit = {
    val nullIds = rows.filter(_._2 == null).map(_._1).toSet
    val df = rows.toDF("id", "text")
    val got = df.select($"id",
        TextFunctions.langId($"text").as("lF"), origLangId($"text").as("lO"),
        TextFunctions.stopwordRatio($"text").as("sEnF"), origStopwordRatio($"text", "en").as("sEnO"),
        TextFunctions.stopwordRatio($"text", "it").as("sItF"), origStopwordRatio($"text", "it").as("sItO"),
        TextFunctions.punctRatio($"text").as("pF"), origPunctRatio($"text").as("pO"),
        TextFunctions.distinctTokenRatio($"text").as("dF"), origDistinctTokenRatio($"text").as("dO"),
        TextFunctions.qualityScoreRaw($"text").as("qF"), origQualityRaw($"text").as("qO"))
      .collect()
    got.foreach { r =>
      val id = r.getLong(0)
      if (nullIds.contains(id)) {
        // NULL text: lang_id = 'und' through BOTH paths (the original's
        // when(score > 0, …).otherwise('und') falls through on a NULL
        // score), every other expression NULL
        assert(r.getString(1) == "und" && r.getString(2) == "und", s"id=$id NULL lang_id")
        (3 to 12).foreach(i => assert(r.isNullAt(i), s"id=$id col=$i not null"))
      } else {
        assert(r.getString(1) == r.getString(2), s"lang_id diverges for id=$id")
        assert(r.getDouble(3) == r.getDouble(4), s"stopword_ratio(en) diverges for id=$id")
        assert(r.getDouble(5) == r.getDouble(6), s"stopword_ratio(it) diverges for id=$id")
        assert(r.getDouble(7) == r.getDouble(8), s"punct_ratio diverges for id=$id")
        assert(r.getDouble(9) == r.getDouble(10), s"distinct_token_ratio diverges for id=$id")
        assert(r.getDouble(11) == r.getDouble(12), s"quality_raw diverges for id=$id")
      }
    }
    assert(got.length == rows.length)
  }

  test("fused == original on adversarial strings") { assertParity(adversarial) }

  test("fused == original on seeded random fuzz (400 docs)") { assertParity(fuzz(0xBEEF, 400)) }

  test("fused == original on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text")
    assertParity(docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("unsupported language fails fast at Column construction") {
    val e = intercept[IllegalArgumentException] {
      TextFunctions.stopwordRatio($"text", "xx")
    }
    assert(e.getMessage.contains("unsupported language"))
  }

  test("lang_id/stopword_ratio stay inside whole-stage codegen in a mixed projection") {
    // the TokenStats doGenCode pattern: one instance-method call, so a
    // projection mixing these with other expressions keeps WSCG for
    // everything in the stage (the old CodegenFallback dropped the
    // whole projection to interpreted eval). Non-foldable source needed
    // (a local relation constant-folds to LocalTableScan).
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        TextFunctions.langId(col("text")).as("lid"),
        TextFunctions.stopwordRatio(col("text"), "en").as("sw"),
        (length(col("text")) * 2).as("other"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("lang_id")),
      s"lang_id must not break WSCG:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("stopword_ratio")),
      s"stopword_ratio must not break WSCG:\n$plan")
  }
}
