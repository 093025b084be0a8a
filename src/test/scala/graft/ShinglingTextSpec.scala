package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shingle expressions' raw-STRING byte-level path must emit hashes
  * bit-identical to the legacy ARRAY<STRING> path fed with
  * `tokens(lower(text))` — the q14/q54 oracles hash the downstream
  * outputs, so any divergence in lowercase, trim, split-limit, or
  * empty-token semantics is a correctness bug. The ARRAY side here is
  * computed by Spark's OWN lower/trim/split, so the fuzz also pins the
  * byte-level reimplementation of those semantics (including full
  * Unicode lowercase via the fallback). */
class ShinglingTextSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  private def adversarial: Seq[(Long, String)] = Seq(
    1L -> "hello world hello world again and again",
    2L -> "",                        // empty
    3L -> "   ",                     // spaces only: tokens() yields EMPTY array
    4L -> "\t",                      // tab survives space-trim: split -> ["",""]
    5L -> "\ta b c",                 // leading non-space ws -> leading empty token
    6L -> "a b c\t",                 // trailing tab -> trailing empty token (limit -1)
    7L -> "  a\n\nb  c\t\td  ",      // mixed runs inside space-trimmed ends
    8L -> "one two",                 // fewer tokens than shingle size
    9L -> "Mixed CASE Tokens lower UPPER lower",
    10L -> "İstanbul ısparta TITLE İİ", // Turkish İ: Unicode lower GROWS the byte length
    11L -> "STRASSE ß Maß",          // sharp s
    12L -> "ΣΙΣΥΦΟΣ σίσυφος ΤΕΛΟΣ",  // final-sigma lowering
    13L -> "éclair café", // combining marks
    14L -> "中文 测试 文档 去重",       // CJK (no case)
    15L -> "emoji 😀 pair 😀😀 end",
    16L -> "ünïcodé mixed ASCII ünïcodé",
    17L -> "abc\rd\ne",  // every ASCII \s class byte as separator
    18L -> "  \t \n ",               // ws-only but NOT space-only: ["",""] after trim
    19L -> ("repeat me " * 200).trim, // long doc, heavy duplication
    20L -> "singleton",
    21L -> null.asInstanceOf[String])

  private def fuzz(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val atoms = Array("a", "b", "ab", "Abc", "WORD", "ß", "İ", "σ", "Σ", "中",
      "😀", "é", " ", "\t", "\n", "", "", "\r", "  ", "1",
      "x9", ".", ",!", "ÆØÅ", "æøå")
    (0 until n).map { i =>
      val len = rnd.nextInt(40)
      (1000L + i, (0 until len).map(_ => atoms(rnd.nextInt(atoms.length))).mkString)
    }
  }

  private def assertParity(rows: Seq[(Long, String)]): Unit = {
    val df = rows.toDF("id", "text")
    val toks = TextFunctions.tokens(lower($"text"))
    val got = df.select($"id",
        call_function("shingle_hashes", $"text", lit(3)).as("shT"),
        call_function("shingle_hashes", toks, lit(3)).as("shA"),
        call_function("minhash_signature", $"text", lit(16), lit(2)).as("sigT"),
        call_function("minhash_signature", toks, lit(16), lit(2)).as("sigA"),
        call_function("minhash_bands", $"text", lit(16), lit(3), lit(4)).as("bT"),
        call_function("minhash_bands", toks, lit(16), lit(3), lit(4)).as("bA"),
        call_function("minhash_prepare", $"text", lit(16), lit(3), lit(4)).as("pT"),
        call_function("minhash_prepare", toks, lit(16), lit(3), lit(4)).as("pA"),
        call_function("repetition_score", $"text", lit(2)).as("rT"),
        call_function("repetition_score", toks, lit(2)).as("rA"))
      .collect()
    got.foreach { r =>
      val id = r.getLong(0)
      if (r.isNullAt(1)) {
        // NULL text must be NULL through BOTH paths of every expression
        (2 to 10).foreach(i => assert(r.isNullAt(i), s"id=$id col=$i not null"))
      } else {
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"shingle_hashes diverges for id=$id")
        assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"minhash_signature diverges for id=$id")
        assert(r.getSeq[Long](5) == r.getSeq[Long](6), s"minhash_bands diverges for id=$id")
        val pT = r.getStruct(7); val pA = r.getStruct(8)
        assert(pT.getSeq[Long](0) == pA.getSeq[Long](0), s"prepare bands diverge for id=$id")
        assert(pT.getSeq[Long](1) == pA.getSeq[Long](1), s"prepare shingle set diverges for id=$id")
        assert(r.getDouble(9) == r.getDouble(10), s"repetition_score diverges for id=$id")
      }
    }
    assert(got.length == rows.length)
  }

  test("raw-text path == tokens(lower(text)) path on adversarial strings") {
    assertParity(adversarial)
  }

  test("raw-text path == tokens(lower(text)) path on seeded random fuzz (500 docs)") {
    assertParity(fuzz(0xC0FFEE, 500))
  }

  test("raw-text path == tokens(lower(text)) path on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val toks = TextFunctions.tokens(lower($"text"))
    val diff = docs.select(
        call_function("minhash_prepare", $"text", lit(64), lit(3), lit(16)).as("pT"),
        call_function("minhash_prepare", toks, lit(64), lit(3), lit(16)).as("pA"))
      .where(not(col("pT") <=> col("pA")))
      .count()
    assert(diff == 0, s"$diff documents diverge between the raw-text and token-array paths")
  }
}
