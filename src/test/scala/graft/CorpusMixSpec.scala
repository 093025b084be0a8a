package graft

import graft.operators.{CorpusMix, StableSplit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.CorpusMix]]: deterministic source-weighted mixture
  * composition. Copy counts must follow the floor+fractional-hash rule
  * exactly (checked against the driver-side pinned-hash reference),
  * composition must be layout-independent, and growing a weight must
  * only ADD copies. */
class CorpusMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = BigInt(1) << 32
  private def refHash(key: Long): Long = {
    val a = (BigInt(key) % M + M) % M
    val h1 = (a * 2654435761L) % M
    val x1 = h1 ^ (h1 >> 16)
    val h2 = (x1 * 2246822519L) % M
    (h2 ^ (h2 >> 13)).toLong
  }

  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, s"doc $i", if (i % 3 == 0) "web" else if (i % 3 == 1) "wiki" else "code")
  }.toDF("id", "text", "source")

  test("copies per document = floor(w) + fractional-hash keep, epochs 0-based") {
    val w = Map("web" -> 0.5, "wiki" -> 2.0, "code" -> 2.25)
    val out = CorpusMix.compose(corpus(300), "source", "id", w)
      .select($"id", $"source", $"epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    (0 until 300).foreach { i =>
      val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "wiki" else "code"
      val ww = w(src)
      val full = math.floor(ww).toInt
      val thresh = math.round((ww - math.floor(ww)) * M.toDouble)
      val want = full + (if (refHash(i.toLong) < thresh) 1 else 0)
      val got = byDoc.getOrElse(i.toLong, Seq.empty)
      assert(got.size == want, s"doc $i ($src, w=$ww): ${got.size} copies, want $want")
      assert(got == (0 until want), s"doc $i: epochs $got must be 0..${want - 1}")
    }
    // fractional rates land near the weights
    assert(out.count(_._2 == "web") / 100.0 > 0.35 && out.count(_._2 == "web") / 100.0 < 0.65)
    assert(out.count(_._2 == "wiki") == 200)
  }

  test("unlisted sources drop; growing a weight only ADDS copies") {
    val small = CorpusMix.compose(corpus(300), "source", "id", Map("web" -> 0.3))
      .select($"id", $"epoch").as[(Long, Int)].collect().toSet
    val big = CorpusMix.compose(corpus(300), "source", "id", Map("web" -> 1.3))
      .select($"id", $"epoch").as[(Long, Int)].collect().toSet
    assert(small.nonEmpty && small.forall(_._2 == 0))
    // 0.3-mix ⊂ 1.3-mix shifted to the fractional epoch: every doc kept
    // at 0.3 is kept by 1.3's fractional epoch (same hash, same thresh)
    assert(small.map(_._1).subsetOf(big.filter(_._2 == 1).map(_._1)))
    // and 1.3 has every doc at epoch 0
    assert(big.count(_._2 == 0) == 100)
  }

  test("composition is layout-independent and NULL ids keep only full epochs") {
    val base = corpus(200)
    val w = Map("web" -> 1.5, "wiki" -> 0.5)
    val a = CorpusMix.compose(base, "source", "id", w)
      .select($"id", $"epoch").as[(Long, Int)].collect().toSet
    val b = CorpusMix.compose(base.repartition(13, $"text"), "source", "id", w)
      .select($"id", $"epoch").as[(Long, Int)].collect().toSet
    assert(a == b)
    val withNull = Seq((java.lang.Long.valueOf(7L), "t", "web"),
      (null.asInstanceOf[java.lang.Long], "u", "web"))
      .toDF("id", "text", "source")
    val got = CorpusMix.compose(withNull, "source", "id", Map("web" -> 2.5))
      .select($"text", $"epoch").as[(String, Int)].collect().toSet
    assert(got.filter(_._1 == "u").map(_._2) == Set(0, 1)) // full epochs only
  }

  test("weight validation fails loudly") {
    intercept[IllegalArgumentException] {
      CorpusMix.compose(corpus(10), "source", "id", Map("web" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      CorpusMix.compose(corpus(10), "source", "id", Map("web" -> 300.0))
    }
    intercept[IllegalArgumentException] {
      CorpusMix.compose(corpus(10), "source", "id", Map.empty[String, Double])
    }
  }

  test("capPerSource ≡ the window formulation, subset-stable in cap, layout-independent") {
    val docs = corpus(300)
    val got = CorpusMix.capPerSource(docs, "source", "id", 7)
      .select($"id").as[Long].collect().toSet
    // driver reference: per source, the 7 smallest (hash, id)
    val want = (0 until 300).map { i =>
      val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "wiki" else "code"
      (src, refHash(i.toLong), i.toLong)
    }.groupBy(_._1).values.flatMap(_.sortBy(t => (t._2, t._3)).take(7).map(_._3)).toSet
    assert(got == want)
    assert(got.size == 21)
    // subset law: tightening the budget never rotates survivors
    val tight = CorpusMix.capPerSource(docs, "source", "id", 3)
      .select($"id").as[Long].collect().toSet
    assert(tight.subsetOf(got) && tight.size == 9)
    // layout independence
    val relaid = CorpusMix.capPerSource(docs.repartition(17, $"text"), "source", "id", 7)
      .select($"id").as[Long].collect().toSet
    assert(relaid == got)
    // cap ≥ group size keeps the whole group; NULL source is its own
    // capped group; NULL ids drop
    val all = CorpusMix.capPerSource(docs, "source", "id", 1000)
    assert(all.count() == 300)
    val withNulls = Seq(
      (java.lang.Long.valueOf(1L), "a", "web"),
      (java.lang.Long.valueOf(2L), "b", null.asInstanceOf[String]),
      (java.lang.Long.valueOf(3L), "c", null.asInstanceOf[String]),
      (java.lang.Long.valueOf(4L), "d", null.asInstanceOf[String]),
      (null.asInstanceOf[java.lang.Long], "e", "web"))
      .toDF("id", "text", "source")
    val nw = CorpusMix.capPerSource(withNulls, "source", "id", 2)
      .select($"text").as[String].collect().toSet
    assert(nw.contains("a") && !nw.contains("e"))
    assert(nw.count(Set("b", "c", "d")) == 2)
    intercept[IllegalArgumentException] {
      CorpusMix.capPerSource(docs, "source", "id", 0)
    }
  }

  test("capPerSource plans as a bounded aggregate — no window, no per-group sort") {
    val docs = corpus(200)
    val plan = CorpusMix.capPerSource(docs, "source", "id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"the cap must not plan a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"the k-heap aggregate must carry the rank:\n$plan")
    // partial (map-side) aggregation before the exchange: the heap
    // ships per task, not every row
    assert(plan.contains("partial_topk_by_score") || plan.contains("partial topk"),
      s"map-side partial heap missing:\n$plan")
  }

  test("mixKey matches the driver reference and scatters epochs of one doc") {
    val out = CorpusMix.compose(corpus(60), "source", "id", Map("wiki" -> 3.0))
      .select($"id", $"epoch",
        CorpusMix.mixKey($"id", $"epoch").as("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    out.foreach { case (id, e, k) =>
      val want = refHash(id ^ ((e + 1L) * 2654435761L))
      assert(k == want, s"mixKey($id, $e): $k vs $want")
    }
    // the three copies of one doc do not share a key
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length)
    }
  }
}
