package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.DistinctNgrams]] pins the statistics token
  * contract (Java-\s runs, empties dropped, case preserved), the
  * Shingling short-document rule (1 ≤ tokens < n → one whole-sequence
  * gram), per-document dedup, and real codegen. The reference is a
  * direct driver-side model; the q92 oracle recomputes the same grams
  * from DuckDB's split + list_transform, so any divergence there is a
  * hash mismatch. */
class DistinctNgramsSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  /** Driver-side reference: trim-free tokenize (empties dropped),
    * n-grams with the whole-sequence short-doc rule, first-occurrence
    * distinct. */
  private def ref(text: String, n: Int): Seq[String] = {
    if (text == null) return null
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return Seq.empty
    val nGrams = math.max(1, toks.length - n + 1)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    (0 until nGrams).foreach { g =>
      out += toks.slice(g, math.min(g + n, toks.length)).mkString(" ")
    }
    out.toSeq
  }

  private def viaSpark(texts: Seq[String], n: Int): Map[Long, Seq[String]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select($"id", TextFunctions.distinctNgrams($"text", n).as("g"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap

  private val adversarial = Seq(
    "the quick brown fox jumps over the lazy dog",
    "", "   ", "\n\n", " \t ", "one", "one two",
    "a a a a a a", "a b a b a b",
    "  spaces around\ttabs\nand newlines  ",
    "verticaltab iswhitespace too",
    "über straße naïve éclair — multi byte tokens",
    "Case case CASE case Case case",
    ("tok " * 200).trim, ("x y " * 50).trim,
    null.asInstanceOf[String])

  test("distinct_ngrams == the driver-side reference on adversarial strings") {
    for (n <- Seq(1, 2, 3, 5, 8, 100)) {
      val got = viaSpark(adversarial, n)
      adversarial.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == ref(t, n),
          s"n=$n text=${if (t == null) "NULL" else s"'$t'"}")
      }
    }
  }

  test("fuzz: random token soups, random n — expression == reference") {
    val rng = new scala.util.Random(0x176A11)
    val vocab = Array("hash", "join", "row", "scan", "a", "bb", "ccc", "naïve", "Ü")
    val texts = (0 until 300).map { _ =>
      val nt = rng.nextInt(30)
      (0 until nt).map(_ => vocab(rng.nextInt(vocab.length)))
        .mkString(Seq(" ", "  ", "\t", "\n")(rng.nextInt(4)))
    }
    for (n <- Seq(1, 2, 3, 4, 7)) {
      val got = viaSpark(texts, n)
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == ref(t, n), s"n=$n i=$i text='$t'")
      }
    }
  }

  test("per-document dedup feeds doc-frequency counting directly") {
    // "a b a b a b" has only TWO distinct 2-grams however long it runs
    val got = viaSpark(Seq("a b a b a b a b"), 2)(0L)
    assert(got == Seq("a b", "b a"))
    // duplicatedNgrams over duplicate docs counts documents, not grams
    val docs = Seq("x y z x y z", "x y z x y z", "p q r").toDF("text")
    val mined = graft.operators.TextRank.duplicatedNgrams(docs, "text", n = 2, minDocs = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(mined == List(("x y", 2L), ("y z", 2L), ("z x", 2L)),
      s"2 duplicate docs -> doc frequency 2 per shared gram: $mined")
  }

  test("stays inside whole-stage codegen") {
    val df = Seq("a b c d").toDF("text")
      .select(explode(TextFunctions.distinctNgrams(col("text"), 2)).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in the
    // compact plan string
    assert(plan.linesIterator.exists(l =>
      l.contains("Generate") && l.trim.startsWith("*(")),
      s"generate stage lost codegen:\n$plan")
    // the expression itself must not fall back to interpreted eval
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("distinctNgrams") || codegen.contains("DistinctNgrams"),
      "generated code must call the fused kernel")
  }

  test("SQL surface: distinct_ngrams(text, n) with literal-int contract") {
    Seq(("a b c", 1L)).toDF("text", "id").createOrReplaceTempView("dn_docs")
    val got = spark.sql("SELECT distinct_ngrams(text, 2) AS g FROM dn_docs")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a b", "b c"))
    val e = intercept[Exception] {
      spark.sql("SELECT distinct_ngrams(text, id) FROM dn_docs").collect()
    }
    assert(e.getMessage.contains("literal integer"), e.getMessage)
  }
}
