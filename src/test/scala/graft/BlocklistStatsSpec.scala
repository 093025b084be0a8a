package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.BlocklistStats]]: hashed term-set token matching
  * against a driver-side reference, the large-list path (hash-collision
  * pressure), and the SQL surface. */
class BlocklistStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ref(text: String, terms: Set[String]): (Int, Int) = {
    val ts = text.split("\\s+").filter(_.nonEmpty)
    (ts.count(terms.contains), ts.length)
  }

  test("matched/total counts == the token-set reference on adversarial strings") {
    val terms = Seq("bad", "worse", "naïve", "x")
    val docs = Seq(
      "bad things happen to bad tokens",
      "nothing to see here",
      "worse than bad but naïve about it",
      "badge badly embadded bad", // substrings must NOT match
      "x x x x x",
      "\tbad\n\nworse  ", "", "   ")
    val got = docs.toDF("text")
      .select(TextFunctions.blocklistStats(col("text"), terms).as("s"))
      .collect().map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getInt(1)))
    docs.zip(got).foreach { case (d, g) =>
      assert(g == ref(d, terms.toSet), s"'$d': got $g, want ${ref(d, terms.toSet)}")
    }
  }

  test("thousands of terms: O(1)-per-token probing stays exact under table pressure") {
    val rng = new scala.util.Random(42)
    // 5000 terms incl. many sharing prefixes/lengths (hash pressure)
    val terms = (0 until 5000).map(i => s"term${i}x${i % 7}")
    val hot = terms(1234); val hot2 = terms(4999)
    val text = s"$hot filler $hot2 filler $hot unknown${rng.nextInt()}"
    val Seq((m, t)) = Seq(text).toDF("text")
      .select(TextFunctions.blocklistStats(col("text"), terms).as("s"))
      .collect().map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getInt(1))).toSeq
    assert((m, t) == (3, 6))
    // duplicate list entries count tokens once per TOKEN, not per entry
    val dup = Seq("bad bad good").toDF("text")
      .select(TextFunctions.blocklistStats(col("text"), Seq("bad", "bad", "bad")).as("s"))
      .head.getStruct(0)
    assert((dup.getInt(0), dup.getInt(1)) == (2, 3))
  }

  test("SQL surface + WSCG + NULL text") {
    Graft.register(spark)
    val r = spark.sql("SELECT blocklist_stats('a b c a', 'a', 'zz') AS s").head.getStruct(0)
    assert((r.getInt(0), r.getInt(1)) == (2, 4))
    assert(spark.sql("SELECT blocklist_stats(CAST(NULL AS STRING), 'a') AS s").head.isNullAt(0))
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.blocklistStats(col("text"), Seq("hash", "join")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("blocklist_stats"),
      s"blocklist_stats must ride whole-stage codegen:\n$plan")
  }
}
