package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The aggregate ranking tail ([[graft.agg.TopKByScore]] via
  * `Similarity.rankTopK`) must be row-identical to the window
  * formulation it replaced — including the ugly corners: cos ties
  * broken by cId, NaN sorting above every finite cos, NULL cos padding
  * the tail (desc NULLS LAST), and groups with fewer than k rows. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // NaN canonicalized to a string: Scala == unboxes and NaN != NaN
  private def cosKey(v: Any): Any = v match {
    case d: java.lang.Double if d.isNaN => "NaN"
    case other => other
  }

  private def compare(rows: Seq[(Long, Long, java.lang.Double)], k: Int): Unit = {
    val scored = rows.toDF("qId", "cId", "cos")
    val got = Similarity.rankTopK(scored, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(cosKey), r.getInt(3))).toSet
    val want = Similarity.rankTopKWindow(scored, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(cosKey), r.getInt(3))).toSet
    assert(got == want, s"agg top-k diverged from window: got $got want $want")
  }

  test("agg top-k == window: ties, NaN, NULL cos, short groups") {
    compare(Seq(
      // q0: plain distinct scores, more than k candidates
      (0L, 10L, 0.9), (0L, 11L, 0.8), (0L, 12L, 0.7), (0L, 13L, 0.6),
      // q1: three-way cos tie -> cId ascending breaks it
      (1L, 22L, 0.5), (1L, 20L, 0.5), (1L, 21L, 0.5), (1L, 23L, 0.4),
      // q2: NaN ranks first (Spark sorts NaN greatest), then finite, then NULL last
      (2L, 30L, Double.NaN), (2L, 31L, 0.99), (2L, 32L, null), (2L, 33L, 0.1),
      // q3: fewer than k rows
      (3L, 40L, 0.2),
      // q4: all NULL scores -> cId ascending
      (4L, 52L, null), (4L, 50L, null), (4L, 51L, null), (4L, 53L, null)
    ), k = 3)
  }

  test("agg top-k == window under a random fuzz (ties + nulls mixed in)") {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(4000) { i =>
      val q = (i % 7).toLong
      val cos: java.lang.Double =
        if (rng.nextInt(20) == 0) null
        else math.round(rng.nextDouble() * 50) / 50.0 // coarse grid -> frequent ties
      (q, rng.nextInt(500).toLong, cos)
    }
    compare(rows, k = 5)
  }

  test("-0.0 scores tie with 0.0 and break on cId, matching the window sort") {
    // Spark's sort treats -0.0 == 0.0 (nanSafeCompareDoubles); a raw
    // Double.compare heap would rank 0.0 above -0.0 and return cId=2
    compare(Seq(
      (0L, 2L, 0.0), (0L, 1L, -0.0), (0L, 3L, -0.5)
    ), k = 1)
    // and as an id type: -0.0 ids tie with 0.0 under ASC
    val scored = Seq((0L, -0.0, 0.5), (0L, 0.0, 0.5), (0L, 7.0, 0.4))
      .toDF("qId", "cId", "cos")
    val got = Similarity.rankTopK(scored, 2).orderBy($"rank")
      .collect().map(_.getDouble(1)).toSeq
    val want = Similarity.rankTopKWindow(scored, 2).orderBy($"rank")
      .collect().map(_.getDouble(1)).toSeq
    assert(got.map(v => v + 0.0) == want.map(v => v + 0.0))
  }

  test("null cIds are dropped by BOTH formulations (the shared contract)") {
    val scored = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (0L, null, 0.99), (0L, 7L, 0.5), (0L, 8L, 0.4),
      (1L, null, 0.9) // a group of ONLY null ids vanishes entirely
    ).toDF("qId", "cId", "cos")
    val got = Similarity.rankTopK(scored, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = Similarity.rankTopKWindow(scored, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == want)
    assert(got == Set((0L, 7L, 1), (0L, 8L, 2)))
  }

  test("string ids rank by binary order on cos ties") {
    val scored = Seq(
      (0L, "b", 0.5), (0L, "a", 0.5), (0L, "c", 0.5), (0L, "d", 0.1)
    ).toDF("qId", "cId", "cos")
    val got = Similarity.rankTopK(scored, 2)
      .orderBy($"rank").collect().map(_.getString(1)).toSeq
    assert(got == Seq("a", "b"))
  }

  test("spill path: sort-based fallback with string ids at large k matches the window") {
    // a fallbackThreshold of 2 forces ObjectHashAggregate into its
    // sort-based path, which serialize()s every TopKBuffer into the
    // external sorter and merges DESERIALIZED partials — the code path
    // the in-memory runs above never hit. String ids + k larger than
    // most groups exercise the variable-length buffer geometry under
    // that round-trip.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try {
      graft.Graft.register(spark)
      val rng = new scala.util.Random(13)
      val rows = Seq.tabulate(6000) { i =>
        val cos: java.lang.Double =
          if (rng.nextInt(25) == 0) null
          else math.round(rng.nextDouble() * 40) / 40.0 // coarse grid: frequent ties
        ((i % 37).toLong, f"id_${rng.nextInt(800)}%04d", cos)
      }
      val scored = rows.toDF("qId", "cId", "cos").repartition(8)
      val k = 200
      val got = scored.groupBy($"qId")
        .agg(expr(s"topk_by_score(cos, cId, $k)").as("top"))
        .select($"qId", posexplode($"top").as(Seq("r", "s")))
        .select($"qId", $"s.cId", $"s.cos", ($"r" + 1).cast("int").as("rank"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(cosKey), r.getInt(3))).toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"qId")
        .orderBy($"cos".desc_nulls_last, $"cId".asc)
      val want = scored.filter($"cId".isNotNull)
        .withColumn("rank", row_number().over(w)).filter($"rank" <= k)
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(cosKey), r.getInt(3))).toSet
      assert(got.nonEmpty && got == want,
        s"spilled agg diverged from window: ${got.diff(want).take(5)} vs ${want.diff(got).take(5)}")
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }
}
