package graft

import graft.operators.TextRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.TextRank]] BM25 against a driver-side literal
  * implementation of the Okapi formula, plus the operator's edge
  * contracts (no match, empty corpus, NULL text, parameter bounds). */
class TextRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark hash join beats sort merge join on small builds"),
    (2L, "hash tables and hash partitioning"),
    (3L, "sort merge join wins at scale"),
    (4L, "vector search is a different beast"),
    (5L, "  leading   whitespace\tand\ttabs everywhere  "),
    (6L, ""))

  /** Driver-side Okapi BM25 over the same token contract. */
  private def ref(query: Seq[String], k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfT = query.distinct.map(t => t -> toks.values.count(_.contains(t))).toMap
    val out = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
    for ((id, ts) <- toks; t <- query.distinct; if dfT(t) > 0) {
      val tf = ts.count(_ == t).toDouble
      if (tf > 0) {
        val idf = math.log((n - dfT(t) + 0.5) / (dfT(t) + 0.5) + 1.0)
        out(id) += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * ts.size / avgdl))
      }
    }
    out.filter(_._2 > 0).toMap
  }

  test("bm25 == the Okapi reference; repeated terms, multi-term queries, df weighting") {
    val docs = corpus.toDF("doc_id", "text")
    for (q <- Seq(Seq("hash"), Seq("join"), Seq("hash", "join"),
                  Seq("vector", "scale", "hash"), Seq("tabs"))) {
      val got = TextRank.bm25(docs, "doc_id", "text", q)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = ref(q)
      assert(got.keySet == want.keySet, s"query $q: docs ${got.keySet} vs ${want.keySet}")
      got.keys.foreach { id =>
        assert(math.abs(got(id) - want(id)) < 1e-9,
          s"query $q doc $id: ${got(id)} vs ${want(id)}")
      }
    }
    // a doc with MORE occurrences of the term must outrank: doc 2
    // has tf(hash)=2 vs doc 1's tf(hash)=1
    val hash = TextRank.bm25(docs, "doc_id", "text", Seq("hash"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hash(2L) > hash(1L), "tf weighting must rank 2 hits over 1")
  }

  test("edge contracts: no match, all-empty corpus, parameter validation") {
    val docs = corpus.toDF("doc_id", "text")
    assert(TextRank.bm25(docs, "doc_id", "text", Seq("zzznope")).count() == 0)
    val empty = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(TextRank.bm25(empty, "doc_id", "text", Seq("x")).count() == 0)
    intercept[IllegalArgumentException](TextRank.bm25(docs, "doc_id", "text", Seq()))
    intercept[IllegalArgumentException](TextRank.bm25(docs, "doc_id", "text", Seq("two words")))
    intercept[IllegalArgumentException](TextRank.bm25(docs, "doc_id", "text", Seq("x"), b = 1.5))
  }

  test("the score pass is one shuffle-free codegen'd scan over the fused count vector") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextRank.bm25(docs, "doc_id", "text", Seq("hash", "join"))
      .queryExecution.executedPlan.toString
    // scores project straight off term_counts — no explode, no
    // (doc, term) rows, nothing to shuffle
    assert(!plan.contains("Exchange"), s"score pass must not shuffle:\n$plan")
    assert(plan.contains("term_counts"), s"score pass must ride the fused kernel:\n$plan")
    assert(plan.contains("*("), s"score pass must ride whole-stage codegen:\n$plan")
  }

  test("term_counts SQL surface: counts + total, literal-term validation") {
    Graft.register(spark)
    val got = spark.sql(
      "SELECT term_counts('hash join hash scan', 'hash', 'scan', 'nope') AS c")
      .head.getSeq[Int](0)
    assert(got == Seq(2, 1, 0, 4), s"got $got")
    val ex = intercept[Exception] {
      spark.sql("SELECT term_counts(text, text) FROM VALUES ('a') AS t(text)").collect()
    }
    assert(ex.getMessage.contains("literal string"), s"got: ${ex.getMessage}")
  }

  test("topTerms: deterministic top-k with tie-break, TakeOrdered plan") {
    val docs = corpus.toDF("doc_id", "text")
    val top = TextRank.topTerms(docs, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // "hash" x3, "join" x3 tie -> term ASC; then a 2-count term
    assert(top.take(2) == Seq(("hash", 3L), ("join", 3L)), s"got $top")
    assert(top(2)._2 == 2L)
    val plan = TextRank.topTerms(docs, "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as a bounded heap, not a full vocab sort:\n$plan")
    intercept[IllegalArgumentException](TextRank.topTerms(docs, "text", 0))
  }

  test("NULL text never matches and never breaks corpus stats") {
    val docs = Seq[(java.lang.Long, String)]((1L, "hash it"), (2L, null), (3L, "no match"))
      .toDF("doc_id", "text")
    val out = TextRank.bm25(docs, "doc_id", "text", Seq("hash"))
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(1L))
  }
}
