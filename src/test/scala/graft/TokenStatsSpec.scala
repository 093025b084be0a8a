package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fused `token_stats` ([[graft.functions.TokenStats]]) must be
  * field-for-field identical to the unfused expressions it replaces —
  * the q10 oracle hash-checks the outputs, so any divergence (trim
  * semantics, split limit, leading/trailing empty tokens, code points)
  * is a correctness bug, not a style choice. */
class TokenStatsSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  private def bothWays(df: org.apache.spark.sql.DataFrame) = {
    val fused = df.withColumn("__ts", TextFunctions.tokenStats($"text"))
      .select($"id", $"__ts.n_tokens".as("a"), $"__ts.n_distinct".as("b"), $"__ts.n_chars".as("c"),
        $"__ts.n_punct".as("d"))
    val unfused = df.select($"id",
      TextFunctions.tokenCount($"text").as("a"),
      size(array_distinct(TextFunctions.tokens($"text"))).as("b"),
      length($"text").as("c"),
      size(regexp_extract_all($"text", lit("[^A-Za-z0-9\\s]"), lit(0))).as("d"))
    (fused.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap,
     unfused.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap)
  }

  test("fused == unfused on adversarial strings") {
    val df = Seq(
      1L -> "hello world hello",
      2L -> "",                       // empty
      3L -> "   ",                    // spaces only (trim -> empty)
      4L -> "\t",                     // tab survives space-trim: split yields ["",""]-ish edges
      5L -> "\ta b",                  // leading non-space whitespace -> leading empty token
      6L -> "a b\t",                  // trailing tab after space-trim -> trailing empty under limit -1
      7L -> "  a\n\nb  c\t\td  ",     // mixed runs + trimmed spaces
      8L -> "ünïcodé 😀 ünïcodé", // multi-byte + surrogate pair (code-point length)
      9L -> "one",
      10L -> "a a a a b"
    ).toDF("id", "text")
    val (fused, unfused) = bothWays(df)
    assert(fused == unfused, s"fused=$fused\nunfused=$unfused")
  }

  test("fused == unfused on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text")
    val (fused, unfused) = bothWays(docs)
    assert(fused.nonEmpty && fused == unfused)
  }

  test("NULL text -> NULL struct; plan stays inside codegen") {
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.withColumn("t", TextFunctions.tokenStats($"text")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(got == Map(1L -> false, 2L -> true))
    // WSCG assertion needs a non-foldable source (a 2-row local
    // relation gets constant-folded into a LocalTableScan)
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("t", TextFunctions.tokenStats(col("text")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("token_stats")),
      s"token_stats must not break WSCG:\n$plan")
  }
}
