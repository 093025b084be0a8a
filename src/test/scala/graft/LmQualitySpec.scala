package graft

import graft.functions.{AllNgrams, TextFunctions}
import graft.operators.LmQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.LmQuality]]: corpus-trained bigram LM scoring.
  * Scores are pinned against a driver-side reference model computed
  * with plain Scala maps (identical token order, identical smoothing),
  * the NULL/short-document contract holds, pruned and unseen bigrams
  * back off, and [[graft.functions.AllNgrams]] keeps multiplicity with
  * no short-document rule. */
class LmQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tokensOf(s: String): Array[String] =
    s.split("[\\s]+").filter(_.nonEmpty)

  /** Driver-side reference: train add-α on `corpus`, score `doc`. */
  private def refScore(corpus: Seq[String], doc: String,
                       alpha: Double = 1.0, minCount: Long = 1L): Option[Double] = {
    val uni = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val big = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    corpus.foreach { t =>
      val ts = tokensOf(t)
      ts.foreach(w => uni(w) += 1)
      ts.sliding(2).filter(_.length == 2).foreach(p => big((p(0), p(1))) += 1)
    }
    val v = uni.size.toLong
    val bigKept = big.filter(_._2 >= minCount)
    val ts = tokensOf(doc)
    if (ts.length < 2) return None
    var sum = 0.0
    ts.sliding(2).filter(_.length == 2).foreach { p =>
      val cb = bigKept.getOrElse((p(0), p(1)), 0L)
      val cu = uni(p(0))
      sum += math.log((cb + alpha) / (cu + alpha * v))
    }
    Some(-sum / (ts.length - 1))
  }

  private val corpus = Seq(
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat ate the fish",
    "a dog and a cat")

  test("scores match the driver-side reference model exactly") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val lm = LmQuality.train(df, "text")
    val got = df.select($"id", LmQuality.score(lm, $"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val want = refScore(corpus, t).get
      assert(math.abs(got(i.toLong) - want) < 1e-12, s"doc $i: ${got(i.toLong)} vs $want")
    }
    // fluent-vs-junk sanity: an in-distribution sentence scores lower
    // than token soup over the same vocabulary
    val probe = Seq((0L, "the cat sat on the mat"), (1L, "mat the on fish a sat")).toDF("id", "text")
    val s = probe.select($"id", LmQuality.score(lm, $"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(0L) < s(1L))
    lm.release()
  }

  test("NULL and short documents score NULL; unseen histories back off to uniform") {
    val df = corpus.toDF("text")
    val lm = LmQuality.train(df, "text")
    val probes = Seq((1L, "single"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "zzz qqq")).toDF("id", "text")
    val got = probes.select($"id", LmQuality.score(lm, $"text").as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty && got(3L).isEmpty)
    // both tokens unseen: P = alpha/(0 + alpha*V) = 1/V exactly
    val v = lm.vocab.toDouble
    assert(math.abs(got(4L).get - math.log(v)) < 1e-12)
    lm.release()
  }

  test("minCount prunes bigrams (graceful backoff); maxModel fails loudly") {
    val df = corpus.toDF("text")
    val pruned = LmQuality.train(df, "text", minCount = 2L)
    // "the cat" appears twice -> survives; "cat ate" once -> pruned
    val got = Seq((1L, "the cat ate")).toDF("id", "text")
      .select(LmQuality.score(pruned, $"text")).head.getDouble(0)
    val want = refScore(corpus, "the cat ate", minCount = 2L).get
    assert(math.abs(got - want) < 1e-12)
    assert(pruned.bigrams < LmQuality.train(df, "text").bigrams)
    pruned.release()
    val ex = intercept[IllegalStateException] {
      LmQuality.train(df, "text", maxModel = 3)
    }
    assert(ex.getMessage.contains("maxModel") || ex.getMessage.contains("3"))
  }

  test("AllNgrams: multiplicity kept, document order, no short-document rule") {
    val got = Seq("a b a b c", "a b", "a", "", "x\t\ny  z").toDF("t")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        AllNgrams(org.apache.spark.sql.graft.ColumnBridge.expression($"t"), 2)).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("a b", "b a", "a b", "b c"))
    assert(got(1) == List("a b"))
    assert(got(2) == Nil) // 1 token < n: EMPTY, not whole-sequence
    assert(got(3) == Nil)
    assert(got(4) == List("x y", "y z"))
    // trigram route, and the wrapper registers the SQL name
    val tri = Seq("p q r s").toDF("t")
      .select(TextFunctions.allNgrams($"t", 3).as("g")).head.getSeq[String](0)
    assert(tri == Seq("p q r", "q r s"))
  }

  test("save/load round-trip: the loaded model scores bit-identically") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val lm = LmQuality.train(df, "text", alpha = 0.25)
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString + "/model"
    LmQuality.save(lm, spark, dir)
    val loaded = LmQuality.load(spark, dir)
    assert(loaded.vocab == lm.vocab && loaded.bigrams == lm.bigrams
      && math.abs(loaded.alpha - 0.25) < 1e-12)
    val probe = Seq((0L, "the cat sat on the mat"), (1L, "zzz qqq www")).toDF("id", "text")
    def scores(m: LmQuality.BigramLm) = probe
      .select($"id", LmQuality.score(m, $"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(lm) == scores(loaded)) // exact double equality
    lm.release(); loaded.release()
    intercept[IllegalStateException] {
      val empty = java.nio.file.Files.createTempDirectory("graft_lm2").toString + "/m"
      Seq(("x", "y", 1L)).toDF("kind", "gram", "n").write.parquet(empty)
      LmQuality.load(spark, empty)
    }
  }

  test("scoreCorpus self-scores and the scoring plan is a pure projection") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val (scored, lm) = LmQuality.scoreCorpus(df, "text")
    assert(scored.columns.contains("lm_score"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"scoring must not shuffle:\n$plan")
    assert(scored.count() == 4)
    lm.release()
  }
}
