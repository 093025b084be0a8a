package graft

import graft.operators.StableSplit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.StableSplit]]: the engine-portable deterministic
  * split. The hash is pinned against a driver-side reference (plain
  * BigInt arithmetic — the same spec the q86 DuckDB oracle recomputes
  * via HUGEINT), split fractions must track the weights, and the
  * assignment must be a pure codegen'd projection. */
class StableSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = BigInt(1) << 32
  /** Driver-side reference of the pinned hash spec. */
  private def refHash(key: Long): Long = {
    val a = (BigInt(key) % M + M) % M
    val h1 = (a * 2654435761L) % M
    val x1 = h1 ^ (h1 >> 16)
    val h2 = (x1 * 2246822519L) % M
    (h2 ^ (h2 >> 13)).toLong
  }

  test("stableHash32 == the plain-arithmetic reference, incl. negatives and 2^32 folding") {
    val keys = Seq(0L, 1L, 2L, 42L, -1L, -42L, Int.MaxValue.toLong,
      (1L << 32) - 1, 1L << 32, (1L << 32) + 1, Long.MaxValue, Long.MinValue + 1,
      1234567890123L) ++ Seq.tabulate(200)(i => i * 7919L - 500000L)
    val got = keys.toDF("k")
      .select($"k", StableSplit.stableHash32($"k").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(got(k) == refHash(k), s"hash($k): got ${got(k)}, want ${refHash(k)}")
      assert(got(k) >= 0 && got(k) < (1L << 32))
    }
  }

  test("split fractions track the weights; assignment is deterministic and key-stable") {
    val df = spark.range(200000).select(col("id"))
    val w = Seq(0.8, 0.1, 0.1)
    val counts = df.select(StableSplit.stableSplit(col("id"), w).as("s"))
      .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2))
    w.zipWithIndex.foreach { case (want, i) =>
      val frac = counts(i).toDouble / 200000
      assert(math.abs(frac - want) < 0.01, s"bucket $i: $frac vs $want")
    }
    // rerun == identical assignment (no rand(), no partition dependence)
    val a = df.select(col("id"), StableSplit.stableSplit(col("id"), w).as("s"))
    val b = df.repartition(7).select(col("id"), StableSplit.stableSplit(col("id"), w).as("s2"))
    assert(a.join(b, "id").filter(col("s") =!= col("s2")).count() == 0)
  }

  test("NULL keys get a NULL bucket, never the last bucket") {
    val df = Seq[java.lang.Long](1L, null, 3L).toDF("k")
    val out = df.select(StableSplit.stableSplit(col("k"), Seq(0.5, 0.5)).as("s")).collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }

  test("invalid weights are rejected loudly") {
    intercept[IllegalArgumentException](StableSplit.stableSplit(col("k"), Seq(1.0)))
    intercept[IllegalArgumentException](StableSplit.stableSplit(col("k"), Seq(0.5, 0.6)))
    intercept[IllegalArgumentException](StableSplit.stableSplit(col("k"), Seq(0.5, -0.5, 1.0)))
  }

  test("SQL surface: stable_hash32 / stable_split match the Column forms; literal weights enforced") {
    Graft.register(spark)
    val r = spark.sql("SELECT stable_hash32(42L) AS h, stable_split(42L, 0.8, 0.1, 0.1) AS s").head
    assert(r.getLong(0) == refHash(42L))
    val viaCol = Seq(42L).toDF("k")
      .select(StableSplit.stableSplit(col("k"), Seq(0.8, 0.1, 0.1))).head.getInt(0)
    assert(r.getInt(1) == viaCol)
    val ex = intercept[Exception] {
      spark.sql("SELECT stable_split(k, k, 0.5) FROM VALUES (1L) AS t(k)").collect()
    }
    assert(ex.getMessage.contains("literal number"), ex.getMessage)
  }

  test("stableSample: fraction tracked, subset law under budget growth, NULL and bounds") {
    val keys = spark.range(20000).toDF("k")
    val s = keys.select(col("k"),
      StableSplit.stableSample(col("k"), 0.1).as("s10"),
      StableSplit.stableSample(col("k"), 0.5).as("s50")).cache()
    val n10 = s.filter(col("s10")).count().toDouble / 20000
    val n50 = s.filter(col("s50")).count().toDouble / 20000
    assert(math.abs(n10 - 0.1) < 0.02, s"10% sample came out at $n10")
    assert(math.abs(n50 - 0.5) < 0.02, s"50% sample came out at $n50")
    // the subset law: growing the budget only ADDS rows
    assert(s.filter(col("s10") && !col("s50")).count() == 0)
    // determinism: same key, same verdict, any run
    val again = keys.select(StableSplit.stableSample(col("k"), 0.1)).collect()
    assert(s.select(col("s10")).collect().map(_.getBoolean(0)).toSeq ==
      again.map(_.getBoolean(0)).toSeq)
    assert(Seq(Option.empty[java.lang.Long]).toDF("k")
      .select(StableSplit.stableSample(col("k"), 0.5)).head.isNullAt(0),
      "NULL key must sample NULL")
    intercept[IllegalArgumentException](StableSplit.stableSample(col("k"), 0.0))
    intercept[IllegalArgumentException](StableSplit.stableSample(col("k"), 1.0))
  }

  test("stableSampleWeighted: keep rate tracks the weight; 0/1 weights are absolute") {
    val d = spark.range(30000).toDF("k")
      .withColumn("w", (col("k") % 10).cast("double") / 10.0)
    val kept = d.select(col("w"),
        StableSplit.stableSampleWeighted(col("k"), col("w")).as("keep"))
      .groupBy("w").agg(avg(col("keep").cast("double")).as("rate"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(kept(0.0) == 0.0, "weight 0 must never keep")
    Seq(0.2, 0.5, 0.9).foreach { w =>
      assert(math.abs(kept(w) - w) < 0.05, s"weight $w kept at ${kept(w)}")
    }
    assert(d.select(StableSplit.stableSampleWeighted(col("k"), lit(1.0)).as("a"))
      .filter(!col("a")).count() == 0, "weight 1 must always keep")
    assert(Seq(1L).toDF("k")
      .select(StableSplit.stableSampleWeighted(col("k"), lit(null).cast("double")))
      .head.isNullAt(0), "NULL weight must sample NULL")
  }

  test("the assignment stays inside whole-stage codegen (pure projection, no shuffle)") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(StableSplit.stableSplit(col("doc_id"), Seq(0.9, 0.05, 0.05)).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
    assert(plan.contains("*("), s"split must ride whole-stage codegen:\n$plan")
  }
}
