package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.ChunkText]] must reproduce the library's split-\s+
  * token contract exactly (space-only trim, leading/trailing empty
  * tokens — the q82 oracle recomputes every window verbatim from
  * DuckDB's string_split_regex, so any divergence is a hash mismatch)
  * and the coverage-stop window rule. The reference here is a direct
  * driver-side model of that contract. */
class ChunkTextSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  /** Driver-side reference: space-trim, split("\\s+", -1), windows of
    * `max` stepping `max - overlap`, stop once a window reaches the
    * end; each window joined with single spaces. */
  private def ref(text: String, max: Int, overlap: Int): Seq[String] = {
    if (text == null) return null
    val trimmed = {
      var b = 0; var e = text.length
      while (b < e && text.charAt(b) == ' ') b += 1
      while (e > b && text.charAt(e - 1) == ' ') e -= 1
      text.substring(b, e)
    }
    if (trimmed.isEmpty) return Seq.empty
    val toks = trimmed.split("\\s+", -1)
    val step = max - overlap
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var s = 0
    var done = false
    while (!done) {
      out += toks.slice(s, math.min(s + max, toks.length)).mkString(" ")
      done = s + max >= toks.length
      s += step
    }
    out.toSeq
  }

  private def viaSpark(texts: Seq[String], max: Int, overlap: Int): Map[Long, Seq[String]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select($"id", TextFunctions.chunkText($"text", max, overlap).as("c"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap

  private val adversarial = Seq(
    "the quick brown fox jumps over the lazy dog",
    "", "   ", "\n\n", " \t ", "one",
    "\n\nleading nonspace whitespace", "trailing run\n\n",
    "  spaces around\ttabs\nand newlines  ",
    "vertical\u000Btab is\u000B\u000Bwhitespace too",
    "über straße naïve éclair — multi byte tokens",
    ("tok " * 200).trim, ("w " * 64).trim, ("w " * 65).trim,
    ("x " * 56).trim, ("x " * 57).trim, ("x " * 120).trim, ("x " * 121).trim,
    null.asInstanceOf[String])

  test("chunk_text == the split-\\s+ window reference on adversarial strings") {
    for ((max, overlap) <- Seq((64, 8), (8, 3), (5, 0), (1, 0), (3, 2))) {
      val got = viaSpark(adversarial, max, overlap)
      adversarial.zipWithIndex.foreach { case (t, i) =>
        val expect = ref(t, max, overlap)
        assert(got(i.toLong) == expect,
          s"divergence at max=$max overlap=$overlap text=${Option(t).map(_.take(40))}: " +
            s"got ${got(i.toLong)}, want $expect")
      }
    }
  }

  test("chunk_text == reference on seeded fuzz (300 docs)") {
    val rng = new scala.util.Random(0xC0FFEE)
    val ws = " \t\n\u000B\f\r" // VT spelled out: Java \\s covers 0x0B, RE2 \\s does not
    val docs = Seq.tabulate(300) { _ =>
      val n = rng.nextInt(160)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        if (rng.nextInt(4) == 0) sb += ws.charAt(rng.nextInt(ws.length))
        else sb += ('a' + rng.nextInt(26)).toChar
      }
      sb.toString
    }
    val got = viaSpark(docs, 7, 2)
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t, 7, 2), s"fuzz divergence on doc $i: '${t.take(60)}'")
    }
  }

  test("windows overlap by exactly `overlap` tokens and cover every token once past the stop rule") {
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val chunks = viaSpark(Seq(text), 64, 8)(0L)
    assert(chunks.length == 3) // starts 0, 56, 112; 112+64 >= 150 stops
    val t1 = chunks(0).split(" "); val t2 = chunks(1).split(" "); val t3 = chunks(2).split(" ")
    assert(t1.length == 64 && t2.length == 64 && t3.length == 38)
    assert(t1.takeRight(8).toSeq == t2.take(8).toSeq, "adjacent windows must share `overlap` tokens")
    assert(t2.takeRight(8).toSeq == t3.take(8).toSeq)
    assert((t1 ++ t2 ++ t3).distinct.length == 150, "every token appears")
  }

  test("stays inside whole-stage codegen and SQL surface agrees") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.chunkText(col("text"), 64, 8).as("c"),
        (length(col("text")) * 2).as("other"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("chunk_text")),
      s"chunk_text must not break WSCG:\n$plan")
    val viaSql = spark.sql(
      "SELECT chunk_text('a b c d e', 2, 1) AS c").head.getSeq[String](0)
    assert(viaSql == Seq("a b", "b c", "c d", "d e"))
  }
}
