package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.GopherStats]] / [[TextFunctions.gopherKeep]]: the
  * Gopher word-level quality rules. Metrics are pinned by hand-counted
  * fixtures (distinct-stopword mask, non-overlapping ellipsis scan,
  * alpha-token rule) and the composed keep decision tracks each
  * threshold independently. */
class GopherStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stats(texts: String*): Array[(Int, Int, Int, Int, Int)] =
    texts.toDF("t").select(TextFunctions.gopherStats($"t").as("g"))
      .select($"g.n_tokens", $"g.n_token_chars", $"g.n_alpha_tokens",
        $"g.n_stop_hits", $"g.n_symbols")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))

  test("token, char, alpha counts") {
    val Array(a, b, c) = stats(
      "the cat sat",          // 3 tokens, 9 chars, 3 alpha
      "12 3.4 x9 ##",         // 4 tokens, 2+3+2+2=9 chars, 1 alpha (x9), 2 '#'
      "")
    assert(a == ((3, 9, 3, 1, 0))) // 'the' is the only stop-octet member
    assert(b == ((4, 9, 1, 0, 2)))
    assert(c == ((0, 0, 0, 0, 0)))
  }

  test("n_stop_hits counts DISTINCT stop-octet members, occurrences don't inflate") {
    val Array(a, b, c) = stats(
      "the the the the",                         // 1 distinct
      "the cat and the dog with a fish",         // the, and, with = 3
      "The AND With")                            // case-sensitive: 0
    assert(a._4 == 1)
    assert(b._4 == 3)
    assert(c._4 == 0)
  }

  test("ellipsis scan is non-overlapping and byte-level; '#' counts anywhere") {
    val Array(a, b, c, d) = stats(
      "wait... what",      // one '...'
      "....",              // one '...' + lone '.' = 1
      "......",            // two
      "a#b #tag ... #")    // 3 '#' + 1 '...'
    assert(a._5 == 1)
    assert(b._5 == 1)
    assert(c._5 == 2)
    assert(d._5 == 4)
  }

  test("gopherKeep tracks each threshold; NULL text is NULL; 0 tokens never keep") {
    val good = "the cat and the dog sat with a fish on the mat they have fun today"
    def keep(t: String, minWords: Int = 5, minStop: Int = 2,
             minAlpha: Double = 0.8, maxSym: Double = 0.1): Option[Boolean] = {
      val r = Seq(t).toDF("t").select(TextFunctions.gopherKeep($"t",
        minWords = minWords, maxWords = 1000, minMeanLen = 2.0, maxMeanLen = 10.0,
        maxSymbolRatio = maxSym, minAlphaRatio = minAlpha, minStopHits = minStop)).head()
      if (r.isNullAt(0)) None else Some(r.getBoolean(0))
    }
    assert(keep(good) == Some(true))
    assert(keep(good, minWords = 100) == Some(false))
    assert(keep("cat dog fish mat rug bird", minStop = 2) == Some(false)) // no stopwords
    assert(keep("1 2 3 4 5 the of", minAlpha = 0.8) == Some(false))       // 2/7 alpha
    assert(keep(good + " ### ### ###", maxSym = 0.1) == Some(false))
    assert(keep("") == Some(false))
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(TextFunctions.gopherKeep($"t")).head()
    assert(r.isNullAt(0))
  }

  test("the kernel stays inside whole-stage codegen") {
    // WSCG assertion needs a non-foldable source (a 2-row local
    // relation gets constant-folded into a LocalTableScan)
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("g", TextFunctions.gopherStats(col("text")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("gopher_stats")),
      s"gopher_stats must not break WSCG:\n$plan")
  }
}
