package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Dedup.dedupAgainstCorpus]]: the incremental-ingest
  * (asymmetric) dedup. Planted exact/near/fresh documents flag
  * correctly, the output is exactly the new batch (history never pairs
  * with itself), NULL text is never a duplicate, and degenerate corpus
  * buckets drop without flagging. */
class DedupAgainstSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(rows: (Long, String)*) = rows.toDF("id", "text")

  private val corpus = mk(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "one two three four five six seven eight nine ten",
    3L -> "red orange yellow green blue indigo violet pink brown black")

  test("exact, near, fresh, and NULL flags") {
    val newBatch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact copy of 1
      (11L, "one two three four five six seven eight nine"),             // 2 minus last word
      (12L, "black brown pink violet indigo blue green yellow orange red"), // 3 reversed
      (13L, "totally unrelated fresh document about something else entirely"),
      (14L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = Dedup.dedupAgainstCorpus(newBatch, corpus, "id", "text", threshold = 0.8)
      .select($"id", $"dup_exact", $"dup_near").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(got.keySet == Set(10L, 11L, 12L, 13L, 14L), "output must be exactly the new batch")
    assert(got(10L) == ((true, true)))   // exact copy is also jaccard-1 near
    assert(got(11L) == ((false, true)))  // 7/8 trigrams shared = 0.875
    assert(got(12L) == ((false, false))) // reversed: no ordered trigram survives
    assert(got(13L) == ((false, false)))
    assert(got(14L) == ((false, false))) // NULL text never duplicates
  }

  test("threshold moves the near boundary; corpus side never self-flags") {
    val newBatch = mk(20L -> "one two three four five six seven eight nine")
    val loose = Dedup.dedupAgainstCorpus(newBatch, corpus, "id", "text", 0.8)
      .select($"dup_near").head.getBoolean(0)
    val strict = Dedup.dedupAgainstCorpus(newBatch, corpus, "id", "text", 0.95)
      .select($"dup_near").head.getBoolean(0)
    assert(loose && !strict)
    // corpus ids never appear in the output even when the corpus has
    // internal duplicates — the asymmetric contract
    val dupCorpus = corpus.unionByName(mk(4L -> "one two three four five six seven eight nine ten"))
    val out = Dedup.dedupAgainstCorpus(newBatch, dupCorpus, "id", "text", 0.8)
      .select($"id").as[Long].collect().toSet
    assert(out == Set(20L))
  }

  test("identical corpus docs collapse before banding; the bucket cap gates the near pass") {
    // 300 verbatim-identical corpus docs are ONE content hash — they
    // collapse to a single banded representative (bucket size 1, no
    // quadratic blowup from exact duplicates), and the verbatim new
    // copy still flags on both passes
    val big = (0 until 300).map(i =>
      (i.toLong, "same words in every single one of these documents here")).toDF("id", "text")
    val newBatch = mk(500L -> "same words in every single one of these documents here")
    val got = Dedup.dedupAgainstCorpus(newBatch, big, "id", "text", 0.8)
      .select($"dup_exact", $"dup_near").head
    assert(got.getBoolean(0) && got.getBoolean(1))
    // the cap itself: at maxBucketSize = 0 every corpus bucket drops,
    // so the near pass can flag nothing — the exact pass is unaffected
    val capped = Dedup.dedupAgainstCorpus(newBatch, big, "id", "text", 0.8,
      maxBucketSize = 0)
      .select($"dup_exact", $"dup_near").head
    assert(capped.getBoolean(0), "exact pass is bucket-independent")
    assert(!capped.getBoolean(1), "over-cap buckets must drop, not flag")
  }

  test("layout independence") {
    val newBatch = mk(
      30L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      31L -> "unrelated content here")
    val a = Dedup.dedupAgainstCorpus(newBatch, corpus, "id", "text")
      .select($"id", $"dup_exact", $"dup_near").collect().map(_.toSeq).toSet
    val b = Dedup.dedupAgainstCorpus(newBatch.repartition(7), corpus.repartition(5), "id", "text")
      .select($"id", $"dup_exact", $"dup_near").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
