package graft

import graft.operators.TextRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.RemoveDupSpans]] / [[TextRank.removeSpans]] /
  * [[TextRank.removeDuplicatedSpans]]: the removal step of
  * exact-substring dedup. Pins window==miner agreement (the gram a
  * document window forms is byte-identical to what DistinctNgrams
  * mines), coverage union over overlapping matches, the Shingling
  * short-document rule, the whitespace-normalizing rebuild, NULL
  * semantics, codegen, and end-to-end mining+removal parity against a
  * driver-side model. The q94 oracle recomputes the whole pipeline in
  * DuckDB. */
class RemoveDupSpansSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  /** Driver-side model: tokenize (Java \s, empties dropped), mark every
    * token covered by a window whose space-joined form is in `grams`
    * (short docs: one whole-sequence window), rejoin survivors. */
  private def ref(text: String, n: Int, grams: Set[String]): (String, Int, Int) = {
    if (text == null) return null
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return ("", 0, 0)
    val covered = Array.fill(toks.length)(false)
    val nWins = math.max(1, toks.length - n + 1)
    (0 until nWins).foreach { g =>
      val e = math.min(g + n, toks.length)
      if (grams.contains(toks.slice(g, e).mkString(" ")))
        (g until e).foreach(covered(_) = true)
    }
    val keep = toks.indices.filterNot(covered).map(toks)
    (keep.mkString(" "), covered.count(identity), toks.length)
  }

  private def viaSpark(texts: Seq[String], n: Int, grams: Array[String]): Map[Long, (String, Int, Int)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    TextRank.removeSpans(df, "text", n, grams).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null
                       else (r.getString(1), r.getInt(2), r.getInt(3)))
    }.toMap
  }

  test("planted duplicated spans are removed; hash collisions cannot fire (byte screen)") {
    val grams = Array("the terms of service", "all rights reserved worldwide")
    val texts = Seq(
      "read the terms of service before continuing",
      "copyright 2026 all rights reserved worldwide",
      "no boilerplate in this document at all",
      "the terms of service the terms of service", // adjacent occurrences
      null.asInstanceOf[String])
    val got = viaSpark(texts, 4, grams)
    assert(got(0L) == (("read before continuing", 4, 7)))
    assert(got(1L) == (("copyright 2026", 4, 6)))
    assert(got(2L) == (("no boilerplate in this document at all", 0, 7)))
    assert(got(3L) == (("", 8, 8)), "back-to-back occurrences both covered")
    assert(got(4L) == null, "NULL text -> NULL struct")
  }

  test("overlapping matches union their coverage") {
    // windows 'a b c' (0-2) and 'c d e'? -- overlap through shared tokens:
    // grams 'a b c' and 'b c d' cover tokens 0..3 of 'a b c d x'
    val got = viaSpark(Seq("a b c d x"), 3, Array("a b c", "b c d"))
    assert(got(0L) == (("x", 4, 5)))
  }

  test("Shingling short-document rule: a duplicated short doc empties out") {
    // 2-token doc, n=3: ONE whole-sequence window — exactly what the
    // miner emits for it, so mining+removal agree end to end
    val got = viaSpark(Seq("hello world", "hello world again"), 3, Array("hello world"))
    assert(got(0L) == (("", 2, 2)), "short doc == gram -> fully removed")
    // the 3-token doc forms the single window 'hello world again',
    // which is NOT in the set — a shorter gram can never alias a
    // longer window (token counts differ through the space bytes)
    assert(got(1L) == (("hello world again", 0, 3)))
  }

  test("whitespace-normalizing rebuild and empty/whitespace-only documents") {
    val got = viaSpark(Seq("  a\t\tb \n c  ", "", " \t\n "), 2, Array("zz yy"))
    assert(got(0L) == (("a b c", 0, 3)), "untouched docs still rejoin with single spaces")
    assert(got(1L) == (("", 0, 0)))
    assert(got(2L) == (("", 0, 0)))
  }

  test("fuzz: mining+removal == the driver-side model end to end") {
    val rng = new scala.util.Random(0xD15EA5E)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "naïve", "Ü")
    val boiler = "call your doctor today"
    val texts = (0 until 200).map { i =>
      val nt = rng.nextInt(24)
      val body = (0 until nt).map(_ => vocab(rng.nextInt(vocab.length)))
      // a third of the docs embed the boilerplate at a random position
      val toks = if (i % 3 == 0) {
        val at = rng.nextInt(body.length + 1)
        body.take(at) ++ boiler.split(' ') ++ body.drop(at)
      } else body
      toks.mkString(Seq(" ", "  ", "\t")(rng.nextInt(3)))
    }
    for (n <- Seq(2, 3, 4)) {
      // model mining: distinct grams per doc, doc-frequency >= 3
      val minDocs = 3
      val gramsOf: String => Set[String] = t => {
        val toks = t.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) Set.empty
        else (0 until math.max(1, toks.length - n + 1))
          .map(g => toks.slice(g, math.min(g + n, toks.length)).mkString(" ")).toSet
      }
      val df = texts.map(gramsOf).flatten
        .groupBy(identity).collect { case (g, occ) if occ.size >= minDocs => g }.toSet
      val df2 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = TextRank.removeDuplicatedSpans(df2, "text", n, minDocs = minDocs.toLong)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == ref(t, n, df), s"n=$n i=$i text='$t'")
      }
    }
  }

  test("maxGrams overflow fails loudly instead of truncating the set") {
    val docs = Seq("a b c d", "a b c d").toDF("text")
    val e = intercept[IllegalStateException] {
      TextRank.removeDuplicatedSpans(docs, "text", n = 2, minDocs = 2L, maxGrams = 2)
    }
    assert(e.getMessage.contains("duplicated"), e.getMessage)
  }

  test("stays inside whole-stage codegen; gram set never serializes into the plan") {
    // a Range child blocks ConvertToLocalRelation from folding the
    // projection driver-side without introducing an exchange (AQE would
    // hide the codegen subtrees until execution)
    // text depends on the range id so constant folding cannot collapse
    // the expression driver-side before the plan is inspected
    val df = spark.range(1).select(
      concat_ws(" ", lit("a"), lit("b"), col("id").cast("string")).as("text"))
    val out = TextRank.removeSpans(df, "text", 2, Array("a b"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("remove_dup_spans"), plan)
    assert(plan.contains("grams=#"), "plan must print the broadcast id, not the set")
    val codegen = org.apache.spark.sql.execution.debug.codegenString(out.queryExecution.executedPlan)
    assert(codegen.contains("RemoveDupSpans") || codegen.contains("removeDupSpans"),
      "generated code must call the kernel")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("0"))
  }
}
