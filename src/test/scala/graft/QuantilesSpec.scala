package graft

import graft.functions.DoubleBits
import graft.operators.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Quantiles]]: exact radix selection must equal a
  * full sort on every rank, across signs, ties, subnormals, infinities,
  * and partition layouts — and never sort or shuffle the data. */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hostile: Seq[Double] = {
    val rnd = new scala.util.Random(7)
    val base = Seq(0.0, -0.0, 1.5, -1.5, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, Double.MinValue,
      Double.PositiveInfinity, Double.NegativeInfinity, 42.0, 42.0, 42.0)
    base ++ (1 to 500).map(_ => rnd.nextGaussian() * math.pow(10, rnd.nextInt(8) - 4)) ++
      (1 to 50).map(_ => 42.0) // a fat tie block
  }

  test("bit key is order-preserving and self-inverse on hostile doubles") {
    val vs = hostile.sorted
    val keys = vs.map(DoubleBits.ordered)
    assert(keys == keys.sorted, "keys must ascend with the double order")
    vs.foreach { v =>
      val back = DoubleBits.fromOrdered(DoubleBits.ordered(v))
      assert(java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(v), s"round-trip of $v")
    }
    // -0.0 keys strictly below 0.0; NaN above +Inf
    assert(DoubleBits.ordered(-0.0) < DoubleBits.ordered(0.0))
    assert(DoubleBits.ordered(Double.NaN) > DoubleBits.ordered(Double.PositiveInfinity))
  }

  test("kthSmallest equals the sorted array at every rank (hostile values, ties, layouts)") {
    val vs = hostile
    val sorted = vs.sorted
    val df = vs.toDF("x").repartition(7)
    Seq(1, 2, 13, vs.size / 2, vs.size - 1, vs.size).foreach { k =>
      val got = Quantiles.kthSmallest(df, col("x"), k)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(sorted(k - 1)),
        s"rank $k: $got vs ${sorted(k - 1)}")
    }
    // layout independence
    val re = Quantiles.kthSmallest(vs.toDF("x").repartition(31, col("x")), col("x"), 17)
    assert(re == sorted(16))
  }

  test("quantileDisc pins the DuckDB contract ceil(q·n); NULLs ignored; bad ranks throw") {
    val df = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null).toDF("x")
    assert(Quantiles.quantileDisc(df, col("x"), 0.9) == 4.0)  // ceil(3.6) = 4
    assert(Quantiles.quantileDisc(df, col("x"), 0.5) == 2.0)  // ceil(2.0) = 2
    assert(Quantiles.quantileDisc(df, col("x"), 0.25) == 1.0) // ceil(1.0) = 1
    intercept[IllegalArgumentException] { Quantiles.quantileDisc(df, col("x"), 0.0) }
    intercept[IllegalArgumentException] { Quantiles.kthSmallest(df, col("x"), 5) } // only 4 non-null
    intercept[IllegalArgumentException] { Quantiles.kthSmallest(df, col("x"), 0) }
  }

  test("keepTopFraction keeps ceil(frac·n) rows plus threshold ties, re-derivable") {
    val vs = (1 to 200).map(_.toDouble)
    val df = vs.toDF("x")
    val kept = Quantiles.keepTopFraction(df, col("x"), 0.1).as[Double].collect().sorted
    assert(kept.toSeq == (181 to 200).map(_.toDouble)) // exactly the top 20
    assert(Quantiles.topFractionThreshold(df, col("x"), 0.1) == 181.0)
    // ties on the threshold are all kept
    val tied = (Seq.fill(10)(5.0) ++ Seq(1.0, 2.0, 3.0)).toDF("x")
    val keptTied = Quantiles.keepTopFraction(tied, col("x"), 0.1).count()
    assert(keptTied == 10) // ceil(0.1·13)=2 ranks, but the 5.0 block ties
  }

  test("weighted selection equals the expanded-multiset sort; mass cut matches cumsum") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map(_ => (rnd.nextGaussian() * 100, 1L + rnd.nextInt(50))) ++
      Seq((7.5, 0L), (-3.25, 5L), (7.5, 3L)) // a zero-mass row and value ties
    val df = rows.toDF("x", "w").repartition(7)
    // reference: expand each row into `w` copies, sort, index
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    val W = expanded.size.toLong
    Seq(1L, W / 3, W / 2, W - 1, W).foreach { k =>
      val got = Quantiles.kthSmallestWeighted(df, col("x"), col("w"), k)
      assert(got == expanded((k - 1).toInt), s"mass rank $k")
    }
    assert(Quantiles.quantileDiscWeighted(df, col("x"), col("w"), 0.5) ==
      expanded((math.ceil(0.5 * W) - 1).toInt))
    // top-25%-of-mass cut: survivors ≥ the mass-rank threshold
    val th = expanded((W - math.ceil(0.25 * W).toLong).toInt) // rank W-ceil(.25W)+1, 0-based
    val kept = Quantiles.keepTopFractionByMass(df, col("x"), col("w"), 0.25)
      .as[(Double, Long)].collect()
    assert(kept.forall(_._1 >= th))
    assert(kept.map(_._2).sum >= math.ceil(0.25 * W).toLong)
    // the zero-mass row passes the FILTER iff its value clears the
    // threshold, but never influences where the threshold lands
    intercept[IllegalArgumentException] {
      Quantiles.kthSmallestWeighted(df, col("x"), col("w"), W + 1)
    }
  }

  test("per-group mass cut: each group keeps its own top token fraction") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 240).map { i =>
      (s"g${i % 3}", rnd.nextGaussian() * 10, 1L + rnd.nextInt(30)) }
    val df = rows.toDF("g", "x", "w").repartition(5)
    val kept = Quantiles.keepTopMassFractionByGroup(
        df, col("g"), col("x"), col("w"), 0.25)
      .as[(String, Double, Long)].collect()
    rows.groupBy(_._1).foreach { case (g, rs) =>
      // reference: expand to the weighted multiset per group
      val expanded = rs.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }.sorted
      val wTot = expanded.size.toLong
      val th = expanded((wTot - math.ceil(0.25 * wTot).toLong).toInt)
      val keptG = kept.filter(_._1 == g)
      assert(keptG.forall(_._2 >= th), s"group $g: a survivor under its threshold")
      assert(keptG.map(_._3).sum >= math.ceil(0.25 * wTot).toLong,
        s"group $g: kept mass short of the budget")
      // and nothing above the threshold was dropped
      assert(keptG.length == rs.count(_._2 >= th), s"group $g: survivor count")
    }
  }

  test("the full 4-pass path (no early collect, no fused exact) still selects exactly") {
    // >2^16 values sharing the top 48 key bits, with BOTH shortcut caps
    // forced below the data: the fused exact histogram refuses (merged
    // distinct 50000 > 1000) and every level-1..3 bucket stays over the
    // collect cap, so all 4 histogram passes genuinely run
    System.setProperty("graft.quantiles.collectCap", "1000")
    System.setProperty("graft.quantiles.exactMergeCap", "1000")
    try {
      val base = DoubleBits.ordered(1.5) & ~0xFFFFL
      val vs = (0 until 70000).map(i => DoubleBits.fromOrdered(base | (i % 50000).toLong))
      val df = vs.toDF("x").repartition(8)
      val sorted = vs.sorted
      Seq(1, 33333, 70000).foreach { k =>
        val got = Quantiles.kthSmallest(df, col("x"), k)
        assert(java.lang.Double.doubleToLongBits(got) ==
          java.lang.Double.doubleToLongBits(sorted(k - 1)), s"rank $k")
      }
    } finally {
      System.clearProperty("graft.quantiles.collectCap")
      System.clearProperty("graft.quantiles.exactMergeCap")
    }
  }

  test("fused exact first pass: tied scores resolve in ONE job; weighted and hostile agree") {
    // the typical curation shape — heavily tied integer-ish scores,
    // distinct count far under the caps — must finish in the single
    // fused scan (round-18 verdict: the residual quantile_cut gap was
    // the fixed per-job floor)
    // shuffle-free source (a repartition would add an AQE stage job and
    // muddy the count): 13-partition range scan, values heavily tied
    val df = spark.range(0, 50000, 1, 13)
      .select((col("id") % 997).cast("double").as("x"))
    val sorted = (0L until 50000L).map(i => (i % 997).toDouble).sorted
    val sc = spark.sparkContext
    sc.setJobGroup("q_fused_probe", "fused exact quantile probe", false)
    val got = Quantiles.kthSmallest(df, col("x"), 12345)
    sc.clearJobGroup()
    assert(got == sorted(12344))
    // the status store is fed asynchronously — poll briefly
    val deadline = System.currentTimeMillis() + 5000
    def jobs() = sc.statusTracker.getJobIdsForGroup("q_fused_probe").length
    while (jobs() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    Thread.sleep(200)
    assert(jobs() == 1, s"fused exact selection should run exactly one job, ran ${jobs()}")
    // hostile values (ties, signed zeros, infinities) through the same path
    val hv = hostile
    val hdf = hv.toDF("x").repartition(7)
    val hs = hv.sorted
    Seq(1, hv.size / 2, hv.size).foreach { k =>
      val g = Quantiles.kthSmallest(hdf, col("x"), k)
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(hs(k - 1)), s"hostile rank $k")
    }
    // weighted mass ranks through the fused histogram
    val wrows = (1 to 2000).map(i => ((i % 97).toDouble, 1L + (i % 7)))
    val wdf = wrows.toDF("x", "w").repartition(5)
    val expanded = wrows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    Seq(1L, expanded.size / 2L, expanded.size.toLong).foreach { k =>
      assert(Quantiles.kthSmallestWeighted(wdf, col("x"), col("w"), k) ==
        expanded((k - 1).toInt), s"weighted mass rank $k")
    }
  }

  test("per-group quantiles equal a per-group sort; group cut matches the window form") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { i =>
      (s"g${i % 5}", rnd.nextGaussian() * math.pow(10, rnd.nextInt(6) - 3))
    } ++ Seq(("g0", -0.0), ("g1", 0.0), ("g2", 42.0), ("g2", 42.0))
    val df = rows.toDF("g", "x").repartition(9)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val got = Quantiles.quantileDiscByGroup(df, col("g"), col("x"), q)
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val s = rs.map(_._2).sorted
        (g, s(math.ceil(q * s.size).toInt - 1))
      }
      assert(got == want, s"q=$q")
    }
    // per-group top-30% cut ≡ the window formulation
    val kept = Quantiles.keepTopFractionByGroup(df, col("g"), col("x"), 0.3)
      .as[(String, Double)].collect().toSet
    val wantKept = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val s = rs.map(_._2).sorted
      val th = s(s.size - math.ceil(0.3 * s.size).toInt)
      rs.filter(_._2 >= th)
    }.toSet
    assert(kept == wantKept)
    // NULL group / NULL score drop; maxGroups fails loudly
    val withNull = (rows :+ (null.asInstanceOf[String], 1.0)).toDF("g", "x")
    assert(Quantiles.quantileDiscByGroup(withNull, col("g"), col("x"), 0.5).keySet ==
      Set("g0", "g1", "g2", "g3", "g4"))
    intercept[IllegalArgumentException] {
      Quantiles.quantileDiscByGroup(df, col("g"), col("x"), 0.5, maxGroups = 2)
    }
  }

  test("IQR fence keeps exactly the in-fence rows; k=0 keeps the quartile box") {
    val vs = (1 to 100).map(_.toDouble) ++ Seq(1e9, -1e9) // two wild outliers
    val df = vs.toDF("x")
    val kept = Quantiles.keepWithinIqrFence(df, col("x"), 1.5)
      .as[Double].collect().sorted
    val s = vs.sorted
    val (q1, q3) = (s(math.ceil(0.25 * s.size).toInt - 1), s(math.ceil(0.75 * s.size).toInt - 1))
    val want = vs.filter(v => v >= q1 - 1.5 * (q3 - q1) && v <= q3 + 1.5 * (q3 - q1)).sorted
    assert(kept.toSeq == want)
    assert(!kept.contains(1e9) && !kept.contains(-1e9))
    // k = 0: only [q1, q3] survives
    val box = Quantiles.keepWithinIqrFence(df, col("x"), 0).as[Double].collect()
    assert(box.min >= q1 && box.max <= q3)
    intercept[IllegalArgumentException] { Quantiles.keepWithinIqrFence(df, col("x"), -1) }
  }

  test("the selection plan aggregates — it never sorts or exchanges the data rows") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val u = df.select(ColumnBridgeProbe.key(col("x")).as("__u"))
    val plan = u.groupBy(shiftrightunsigned(col("__u"), 48).bitwiseAND(lit(0xFFFFL)))
      .count().queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"radix pass must not sort:\n$plan")
    assert(plan.contains("HashAggregate"), s"radix pass must hash-aggregate:\n$plan")
  }

  test("empty / all-NULL / zero-mass inputs: keep* return empty, scalar quantiles throw a named error") {
    val empty = Seq.empty[Double].toDF("x")
    val allNull = Seq[(Long, Option[Double])]((1L, None), (2L, None)).toDF("id", "x")
    val zeroMass = Seq((1L, 5.0, 0L), (2L, 7.0, 0L)).toDF("id", "x", "w")
    // keep* operators: the top-X% of nothing is nothing, not a crash
    // (a plausible state straight after an upstream filter)
    assert(Quantiles.keepTopFraction(empty, col("x"), 0.1).count() == 0L)
    assert(Quantiles.keepTopFraction(allNull, col("x"), 0.1).count() == 0L)
    assert(Quantiles.keepWithinIqrFence(allNull, col("x")).count() == 0L)
    assert(Quantiles.keepTopFractionByMass(zeroMass, col("x"), col("w"), 0.5).count() == 0L)
    assert(Quantiles.keepTopFractionByGroup(allNull, lit("g"), col("x"), 0.5).count() == 0L)
    assert(Quantiles.keepTopMassFractionByGroup(zeroMass, lit("g"), col("x"), col("w"), 0.5).count() == 0L)
    // scalar quantiles of an empty set do not exist — named error, not
    // a bare rank-out-of-range require
    val e = intercept[IllegalArgumentException] { Quantiles.quantileDisc(allNull, col("x"), 0.5) }
    assert(e.getMessage.contains("no scorable rows"), e.getMessage)
    intercept[IllegalArgumentException] { Quantiles.kthSmallest(empty, col("x"), 1) }
    intercept[IllegalArgumentException] {
      Quantiles.kthSmallestWeighted(zeroMass, col("x"), col("w"), 1) }
    // per-group scalar map: simply empty
    assert(Quantiles.quantileDiscByGroup(allNull, lit("g"), col("x"), 0.5).isEmpty)
  }
}

private object ColumnBridgeProbe {
  def key(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.DoubleBitsOrdered(
        org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("double"))))
      .bitwiseXOR(lit(Long.MinValue))
}
