package graft

import graft.mice.{Mice, MiceJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Flight-style multi-table imputation ([[graft.mice.MiceJoin]]): the
  * model trains FACTORIZED over fact ⋈ dim; on exactly-linear data the
  * imputed values must reproduce the generating function, and they must
  * agree with training over the materialized join (the q09 factorized ==
  * materialized identity, at MICE's service). */
class MiceJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // y = 2 + 3*x1 + 0.5*x2 EXACTLY — imputation must recover it exactly
  val dim = Seq.tabulate(40)(k => (k.toLong, k * 1.5 - 10.0)).toDF("k", "x2")
  def fact = Seq.tabulate(400) { i =>
    val k = i % 40
    val x1 = (i % 17).toDouble - 8
    val x2 = k * 1.5 - 10.0
    val y = 2.0 + 3.0 * x1 + 0.5 * x2
    (i.toLong, k.toLong, x1, y, i % 5 == 0)
  }.toDF("id", "k", "x1", "yTrue", "miss")
    .withColumn("y", when($"miss", lit(null)).otherwise($"yTrue"))
    .repartition(4)

  test("imputed values recover an exactly-linear fact~fact+dim relation") {
    val tm = new Mice.Timings
    val done = MiceJoin.imputeContOverJoin(fact, dim, key = "k", target = "y",
      factNum = Seq("x1"), dimNum = Seq("x2"), tm = tm)
    assert(done.count() == 400)
    assert(done.filter($"y".isNull).count() == 0)
    val maxErr = done.filter($"miss")
      .select(max(abs($"y" - $"yTrue"))).head.getDouble(0)
    assert(maxErr < 1e-6, s"imputation should be exact on linear data, max err $maxErr")
    // the factorized static cofactor phase must have run
    assert(tm.totals.contains("cofactor_static") && tm.totals.contains("train"))
  }

  test("star impute (2 dims) recovers an exactly-linear relation and matches the materialized train") {
    import graft.ml.Factorized.StarDim
    // y = 2 + 3*x1 + 0.5*d1 - 1.5*d2 EXACTLY, features in TWO dims
    val dimA = Seq.tabulate(40)(k => (k.toLong, k * 1.5 - 10.0)).toDF("ka", "d1")
    val dimB = Seq.tabulate(25)(k => (k.toLong, k * 0.8 + 2.0)).toDF("kb", "d2")
    val starFact = Seq.tabulate(400) { i =>
      val ka = i % 40; val kb = i % 25
      val x1 = (i % 17).toDouble - 8
      val y = 2.0 + 3.0 * x1 + 0.5 * (ka * 1.5 - 10.0) - 1.5 * (kb * 0.8 + 2.0)
      (i.toLong, ka.toLong, kb.toLong, x1, y, i % 5 == 0)
    }.toDF("id", "ka", "kb", "x1", "yTrue", "miss")
      .withColumn("y", when($"miss", lit(null)).otherwise($"yTrue"))
      .repartition(4)
    val dims = Seq(StarDim(dimA, "ka", Seq("d1")), StarDim(dimB, "kb", Seq("d2")))
    for (pin <- Seq(0.0, Double.MaxValue)) { // chain AND materialized fallback
      val done = MiceJoin.imputeContOverStar(starFact, dims, target = "y",
        factNum = Seq("x1"), minRowsPerKey = pin)
      assert(done.count() == 400 && done.filter($"y".isNull).count() == 0)
      val maxErr = done.filter($"miss")
        .select(max(abs($"y" - $"yTrue"))).head.getDouble(0)
      assert(maxErr < 1e-6, s"star imputation (pin=$pin) should be exact, max err $maxErr")
    }
    // a duplicated key in EITHER dim must fail loudly (imputation
    // left-joins must not fan out fact rows)
    val dupB = dimB.union(Seq((3L, 99.0)).toDF("kb", "d2"))
    val ex = intercept[IllegalArgumentException] {
      MiceJoin.imputeContOverStar(starFact,
        Seq(StarDim(dimA, "ka", Seq("d1")), StarDim(dupB, "kb", Seq("d2"))),
        target = "y", factNum = Seq("x1"))
    }
    assert(ex.getMessage.contains("unique"))
    // the failing probe must NOT have been memoized: the same duplicated
    // dim fails again (only passing verdicts are cached, r21)
    val ex2 = intercept[IllegalArgumentException] {
      MiceJoin.imputeContOverStar(starFact,
        Seq(StarDim(dimA, "ka", Seq("d1")), StarDim(dupB, "kb", Seq("d2"))),
        target = "y", factNum = Seq("x1"))
    }
    assert(ex2.getMessage.contains("unique"))
  }

  test("star impute with a CATEGORICAL dim feature recovers per-category offsets exactly") {
    import graft.ml.Factorized.StarDim
    // y = 2 + 3*x1 + 0.5*d1 + eff(c2) EXACTLY — c2 is a 3-level
    // categorical carried by dim B, so the regression's one-hot block
    // must flow through the chained star cofactor AND the predictor
    val dimA = Seq.tabulate(40)(k => (k.toLong, k * 1.5 - 10.0)).toDF("ka", "d1")
    val dimB = Seq.tabulate(25)(k => (k.toLong, k % 3)).toDF("kb", "c2")
    def eff(c: Int): Double = c match { case 0 => -2.0; case 1 => 0.5; case _ => 4.0 }
    val starFact = Seq.tabulate(400) { i =>
      val ka = i % 40; val kb = i % 25
      val x1 = (i % 17).toDouble - 8
      val y = 2.0 + 3.0 * x1 + 0.5 * (ka * 1.5 - 10.0) + eff(kb % 3)
      (i.toLong, ka.toLong, kb.toLong, x1, y, i % 5 == 0)
    }.toDF("id", "ka", "kb", "x1", "yTrue", "miss")
      .withColumn("y", when($"miss", lit(null)).otherwise($"yTrue"))
      .repartition(4)
    val dims = Seq(StarDim(dimA, "ka", num = Seq("d1")),
      StarDim(dimB, "kb", cat = Seq("c2")))
    for (pin <- Seq(0.0, Double.MaxValue)) { // chain AND materialized fallback
      val done = MiceJoin.imputeContOverStar(starFact, dims, target = "y",
        factNum = Seq("x1"), minRowsPerKey = pin)
      assert(done.count() == 400 && done.filter($"y".isNull).count() == 0)
      val maxErr = done.filter($"miss")
        .select(max(abs($"y" - $"yTrue"))).head.getDouble(0)
      assert(maxErr < 1e-6, s"categorical-dim star imputation (pin=$pin) should be exact, max err $maxErr")
    }
  }

  test("factorized training == training over the materialized join") {
    val observed = fact.filter(!$"miss")
    val tFact = graft.ml.Factorized.cofactorOverJoin(
      observed, dim, "k", Seq("y", "x1"), Seq(), Seq("x2"), Seq())
    val tMat = Graft.cofactor(observed.join(dim, "k"), Seq("y", "x1", "x2"), Seq())
    assert(tFact.approxEquals(tMat, 1e-9))
    val (mF, mM) = (graft.ml.LinReg.train(tFact, 0), graft.ml.LinReg.train(tMat, 0))
    assert(math.abs(mF.intercept - mM.intercept) < 1e-9)
    assert(mF.numCoef.zip(mM.numCoef).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("MICE over catalog-BUCKETED tables == MICE over raw frames (bucketize-once pattern)") {
    // the 100 TB shape: fact and dim bucketized once on the join key,
    // every column-step's training join rides the bucketed co-located
    // tier via hashJoinIfSafe with no API change — results must be
    // IDENTICAL to the raw-frame run (the tier only changes the plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Tables.writeBucketed(fact, "mice_fact_bkt", "k", 8)
      graft.sources.Tables.writeBucketed(dim, "mice_dim_bkt", "k", 8)
      val tm = new Mice.Timings
      val bucketed = MiceJoin.imputeContOverJoin(
        spark.table("mice_fact_bkt"), spark.table("mice_dim_bkt"),
        key = "k", target = "y", factNum = Seq("x1"), dimNum = Seq("x2"), tm = tm)
      val raw = MiceJoin.imputeContOverJoin(fact, dim, key = "k", target = "y",
        factNum = Seq("x1"), dimNum = Seq("x2"), tm = new Mice.Timings)
      val joined = bucketed.select($"id", $"y".as("yB"))
        .join(raw.select($"id", $"y".as("yR")), "id")
      assert(joined.count() == 400)
      val maxDiff = joined.select(max(abs($"yB" - $"yR"))).head.getDouble(0)
      assert(maxDiff < 1e-9, s"bucketed MICE diverged from raw: $maxDiff")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS mice_fact_bkt")
      spark.sql("DROP TABLE IF EXISTS mice_dim_bkt")
    }
  }

  test("chained 2-column MICE over the join == Mice.baseline on the materialized join") {
    // two imputed fact columns (one continuous, one CATEGORICAL via the
    // LDA path) + a dim feature; the chained-over-join loop must
    // reproduce baseline MICE run on the wide join, column for column
    val rng = new scala.util.Random(3)
    val dim2 = Seq.tabulate(30)(k => (k.toLong, k * 0.7 - 9.0)).toDF("k", "d1")
    val base = Seq.tabulate(600) { i =>
      val k = i % 30
      val x = rng.nextGaussian() * 2
      val d1 = k * 0.7 - 9.0
      val y = 1.5 + 2.0 * x + 0.8 * d1 + rng.nextGaussian() * 0.1
      val c = if (y + rng.nextGaussian() * 0.5 > 1.5) 1 else 0
      (i.toLong, k.toLong, x, y, c, i % 7 == 0, i % 11 == 3)
    }.toDF("id", "k", "x", "yT", "cT", "missY", "missC")
      .withColumn("y", when($"missY", lit(null)).otherwise($"yT"))
      .withColumn("c", when($"missC", lit(null)).otherwise($"cT"))
      .repartition(4)

    val cfg = MiceJoin.ChainConfig(
      factNum = Seq("y", "x"), factCat = Seq("c"),
      dimNum = Seq("d1"), imputeCont = Seq("y"), imputeCat = Seq("c"),
      iterations = 2, normalize = false)
    val chained = MiceJoin.imputeChainedOverJoin(base, dim2, "k", cfg)

    val mat = base.join(dim2, "k")
    val bCfg = Mice.Config(
      contCols = Seq("y", "x", "d1"), catCols = Seq("c"),
      imputeCont = Seq("y"), imputeCat = Seq("c"), iterations = 2)
    val baseline = Mice.baseline(mat, bCfg)

    val joined = chained.select($"id", $"y".as("yJ"), $"c".as("cJ"))
      .join(baseline.select($"id", $"y".as("yB"), $"c".as("cB")), "id")
    assert(joined.count() == 600)
    val maxY = joined.select(max(abs($"yJ" - $"yB"))).head.getDouble(0)
    assert(maxY < 1e-6, s"continuous chain diverged from baseline: max |Δy| = $maxY")
    val catDiff = joined.filter($"cJ" =!= $"cB").count()
    assert(catDiff == 0, s"LDA chain diverged from baseline on $catDiff rows")
  }

  test("chained 2-column MICE over a 2-dim STAR == Mice.baseline on the materialized star join") {
    import graft.ml.Factorized.StarDim
    val rng = new scala.util.Random(11)
    val dimA = Seq.tabulate(30)(k => (k.toLong, k * 0.7 - 9.0)).toDF("ka", "d1")
    val dimB = Seq.tabulate(20)(k => (k.toLong, k * 1.3 + 4.0)).toDF("kb", "d2")
    val base = Seq.tabulate(600) { i =>
      val ka = i % 30; val kb = i % 20
      val x = rng.nextGaussian() * 2
      val d1 = ka * 0.7 - 9.0; val d2 = kb * 1.3 + 4.0
      val y = 1.5 + 2.0 * x + 0.8 * d1 - 0.4 * d2 + rng.nextGaussian() * 0.1
      val c = if (y + rng.nextGaussian() * 0.5 > 1.0) 1 else 0
      (i.toLong, ka.toLong, kb.toLong, x, y, c, i % 7 == 0, i % 11 == 3)
    }.toDF("id", "ka", "kb", "x", "yT", "cT", "missY", "missC")
      .withColumn("y", when($"missY", lit(null)).otherwise($"yT"))
      .withColumn("c", when($"missC", lit(null)).otherwise($"cT"))
      .repartition(4)
    val dims = Seq(StarDim(dimA, "ka", Seq("d1")), StarDim(dimB, "kb", Seq("d2")))
    val cfg = MiceJoin.ChainConfig(
      factNum = Seq("y", "x"), factCat = Seq("c"),
      dimNum = Seq(), dimCat = Seq(), imputeCont = Seq("y"), imputeCat = Seq("c"),
      iterations = 2, normalize = false)
    val chained = MiceJoin.imputeChainedOverStar(base, dims, cfg)

    val mat = base.join(dimA, "ka").join(dimB, "kb")
    val bCfg = Mice.Config(
      contCols = Seq("y", "x", "d1", "d2"), catCols = Seq("c"),
      imputeCont = Seq("y"), imputeCat = Seq("c"), iterations = 2)
    val baseline = Mice.baseline(mat, bCfg)

    val joined = chained.select($"id", $"y".as("yJ"), $"c".as("cJ"))
      .join(baseline.select($"id", $"y".as("yB"), $"c".as("cB")), "id")
    assert(joined.count() == 600)
    val maxY = joined.select(max(abs($"yJ" - $"yB"))).head.getDouble(0)
    assert(maxY < 1e-6, s"continuous star chain diverged from baseline: max |Δy| = $maxY")
    assert(joined.filter($"cJ" =!= $"cB").count() == 0, "LDA star chain diverged from baseline")
    // declaring dim features in ChainConfig (single-join style) must be
    // rejected in the star overload — they belong on the StarDims
    val ex = intercept[IllegalArgumentException] {
      MiceJoin.imputeChainedOverStar(base, dims, cfg.copy(dimNum = Seq("d1")))
    }
    assert(ex.getMessage.contains("StarDim"))
  }

  test("non-stochastic chain reaches a fixed point") {
    val dim2 = Seq.tabulate(30)(k => (k.toLong, k * 0.7 - 9.0)).toDF("k", "d1")
    val rng = new scala.util.Random(5)
    val base = Seq.tabulate(500) { i =>
      val k = i % 30
      val x = rng.nextGaussian() * 2
      val y = 1.0 + 1.2 * x + 0.5 * (k * 0.7 - 9.0) + rng.nextGaussian() * 0.05
      val z = -2.0 + 0.7 * y + rng.nextGaussian() * 0.05
      (i.toLong, k.toLong, x, y, z, i % 6 == 0, i % 9 == 2)
    }.toDF("id", "k", "x", "yT", "zT", "missY", "missZ")
      .withColumn("y", when($"missY", lit(null)).otherwise($"yT"))
      .withColumn("z", when($"missZ", lit(null)).otherwise($"zT"))
    def run(iters: Int) = MiceJoin.imputeChainedOverJoin(base, dim2, "k",
      MiceJoin.ChainConfig(factNum = Seq("y", "z", "x"), factCat = Seq(),
        dimNum = Seq("d1"), imputeCont = Seq("y", "z"), iterations = iters))
    val at6 = run(6).select($"id", $"y".as("y6"), $"z".as("z6"))
    val at7 = run(7).select($"id", $"y".as("y7"), $"z".as("z7"))
    val d = at6.join(at7, "id")
      .select(max(abs($"y6" - $"y7") + abs($"z6" - $"z7"))).head.getDouble(0)
    assert(d < 1e-8, s"chain had not converged by iteration 6: extra-iteration delta $d")
  }

  test("chained 4-column MICE (overlapping strata) == baseline — exercises branch fragmentation + the coalesce valve") {
    // four imputed columns with OVERLAPPING missing patterns fragment
    // the branch representation toward its 2^k worst case (rows missing
    // in several columns form joint strata), driving the generation
    // past the 12-branch safety valve so the whole-checkpoint coalesce
    // path is exercised under the parity gate, not just the fast path
    val dim2 = Seq.tabulate(30)(k => (k.toLong, k * 0.7 - 9.0)).toDF("k", "d1")
    val rng = new scala.util.Random(17)
    val base = Seq.tabulate(900) { i =>
      val k = i % 30
      val x = rng.nextGaussian() * 2
      val d1 = k * 0.7 - 9.0
      val y = 1.0 + 1.2 * x + 0.5 * d1 + rng.nextGaussian() * 0.05
      val z = -2.0 + 0.7 * y + rng.nextGaussian() * 0.05
      val w = 0.3 * x - 0.2 * z + rng.nextGaussian() * 0.05
      val v = 0.9 - 0.4 * w + 0.1 * y + rng.nextGaussian() * 0.05
      (i.toLong, k.toLong, x, y, z, w, v,
        i % 5 == 0, i % 7 == 0, i % 6 == 0, i % 11 == 0)
    }.toDF("id", "k", "x", "yT", "zT", "wT", "vT", "mY", "mZ", "mW", "mV")
      .withColumn("y", when($"mY", lit(null)).otherwise($"yT"))
      .withColumn("z", when($"mZ", lit(null)).otherwise($"zT"))
      .withColumn("w", when($"mW", lit(null)).otherwise($"wT"))
      .withColumn("v", when($"mV", lit(null)).otherwise($"vT"))
      .select($"id", $"k", $"x", $"y", $"z", $"w", $"v")
    val chained = MiceJoin.imputeChainedOverJoin(base, dim2, "k",
      MiceJoin.ChainConfig(factNum = Seq("y", "z", "w", "v", "x"), factCat = Seq(),
        dimNum = Seq("d1"), imputeCont = Seq("y", "z", "w", "v"),
        iterations = 3, normalize = false))
    val bCfg = Mice.Config(
      contCols = Seq("y", "z", "w", "v", "x", "d1"), catCols = Seq(),
      imputeCont = Seq("y", "z", "w", "v"), imputeCat = Seq(), iterations = 3)
    val baseline = Mice.baseline(base.join(dim2, "k"), bCfg)
    val joined = chained.select($"id", $"y".as("yJ"), $"z".as("zJ"), $"w".as("wJ"), $"v".as("vJ"))
      .join(baseline.select($"id", $"y".as("yB"), $"z".as("zB"), $"w".as("wB"), $"v".as("vB")), "id")
    assert(joined.count() == 900)
    val maxD = joined.select(max(
      abs($"yJ" - $"yB") + abs($"zJ" - $"zB") + abs($"wJ" - $"wB") + abs($"vJ" - $"vB")
    )).head.getDouble(0)
    assert(maxD < 1e-6, s"4-column chain diverged from baseline: max Σ|Δ| = $maxD")
  }

  test("missing row without a dim match falls back to the observed mean") {
    val orphan = Seq((999L, 999L, 1.0, null.asInstanceOf[java.lang.Double], true))
      .toDF("id", "k", "x1", "yTrue", "miss")
      .withColumn("y", lit(null).cast("double"))
      .select("id", "k", "x1", "yTrue", "miss", "y")
    val done = MiceJoin.imputeContOverJoin(
      fact.select("id", "k", "x1", "yTrue", "miss", "y").unionByName(orphan),
      dim, key = "k", target = "y", factNum = Seq("x1"), dimNum = Seq("x2"))
    val mean = fact.filter(!$"miss").select(avg($"y")).head.getDouble(0)
    val got = done.filter($"id" === 999L).select($"y").head.getDouble(0)
    assert(math.abs(got - mean) < 1e-9, s"orphan row should get the observed mean, got $got vs $mean")
  }

  test("orphan row with a CATEGORICAL dim feature gets the mean, not a silent class-0 block") {
    import graft.ml.Factorized.StarDim
    // target depends on a categorical dim feature; the orphan's key has
    // no dim row, so its one-hot block is undefined — without the
    // explicit null-feature fallback, LinReg's unseen-category coalesce
    // would one-hot it to all-zero and impute a biased model value
    val rng = new scala.util.Random(5)
    val catDim = Seq.tabulate(40)(k => (k.toLong, k % 3)).toDF("k", "c")
    val rows = Seq.tabulate(400) { i =>
      val k = (i % 40).toLong
      val x = rng.nextGaussian()
      val y = 2.0 * x + Seq(0.0, 5.0, -3.0)((i % 40) % 3) + 10.0
      (i.toLong, k, x, y, i % 5 == 0)
    }
    val f = rows.toDF("id", "k", "x1", "yTrue", "miss")
      .withColumn("y", when($"miss", lit(null)).otherwise($"yTrue"))
    val orphan = Seq((999L, 999L, 0.0, 0.0, true)).toDF("id", "k", "x1", "yTrue", "miss")
      .withColumn("y", lit(null).cast("double"))
    val done = MiceJoin.imputeContOverStar(f.unionByName(orphan),
      Seq(StarDim(catDim, "k", Seq(), Seq("c"))),
      target = "y", factNum = Seq("x1"))
    val mean = f.filter(!$"miss").select(avg($"y")).head.getDouble(0)
    val got = done.filter($"id" === 999L).select($"y").head.getDouble(0)
    assert(math.abs(got - mean) < 1e-9,
      s"orphan with categorical dim feature must fall back to the mean: $got vs $mean")
  }

  test("chained star: orphan row KEEPS its value instead of taking a class-0 prediction") {
    import graft.ml.Factorized.StarDim
    val rng = new scala.util.Random(11)
    val catDim = Seq.tabulate(30)(k => (k.toLong, k % 2)).toDF("k", "c")
    val rows = Seq.tabulate(300) { i =>
      val k = (i % 30).toLong
      val x = rng.nextGaussian()
      (i.toLong, k, x, 3.0 * x + ((i % 30) % 2) * 4.0, i % 4 == 0)
    }
    val f = rows.toDF("id", "k", "x1", "yTrue", "miss")
      .withColumn("y", when($"miss", lit(null)).otherwise($"yTrue"))
      .select("id", "k", "x1", "y")
    val orphan = Seq((999L, 999L, 0.25)).toDF("id", "k", "x1")
      .withColumn("y", lit(null).cast("double"))
    val done = MiceJoin.imputeChainedOverStar(f.unionByName(orphan),
      Seq(StarDim(catDim, "k", Seq(), Seq("c"))),
      MiceJoin.ChainConfig(factNum = Seq("x1", "y"), factCat = Seq(),
        dimNum = Seq(), imputeCont = Seq("y"), iterations = 2))
    // the orphan keeps its initialized value = the observed mean (the
    // chained keep-your-value contract), never a class-0 model output
    val mean = f.filter($"y".isNotNull).select(avg($"y")).head.getDouble(0)
    val got = done.filter($"id" === 999L).select($"y").head.getDouble(0)
    assert(math.abs(got - mean) < 1e-9,
      s"chained orphan must keep its mean-initialized value: $got vs $mean")
  }

  test("target in factNum is rejected loudly; NULL-keyed dim rows do not abort the probe") {
    val ex = intercept[IllegalArgumentException] {
      MiceJoin.imputeContOverJoin(fact, dim, "k", target = "y",
        factNum = Seq("y", "x1"), dimNum = Seq("x2"))
    }
    assert(ex.getMessage.contains("must not also appear in factNum"))
    // two NULL-keyed dim rows: an equi-join can never match them, so the
    // unique-key probe must not treat them as a duplicated key
    val dimWithNulls = dim.unionByName(Seq(
      (null.asInstanceOf[java.lang.Long], 1.0), (null.asInstanceOf[java.lang.Long], 2.0))
      .toDF("k", "x2"))
    val done = MiceJoin.imputeContOverJoin(fact, dimWithNulls, "k",
      target = "y", factNum = Seq("x1"), dimNum = Seq("x2"))
    assert(done.filter($"y".isNull).count() == 0)
  }

  test("final-step consumed checkpoints stay live until the caller releases the returned plan") {
    // The FINAL step's updated parts are intentionally NOT checkpointed:
    // the branches they read (iter-1 checkpoints whose allFlag already
    // contains the last column) must therefore stay persisted inside the
    // returned lazy plan — unpersisting them at the final step would make
    // the caller's single consumption recompute each consumed branch's
    // update-join chain through every previously dropped generation.
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.storage.StorageLevel
    val rng = new scala.util.Random(7)
    val dim2 = Seq.tabulate(30)(k => (k.toLong, k * 0.7 - 9.0)).toDF("k", "d1")
    val base = Seq.tabulate(600) { i =>
      val k = i % 30
      val x = rng.nextGaussian() * 2
      val y = 1.5 + 2.0 * x + 0.8 * (k * 0.7 - 9.0) + rng.nextGaussian() * 0.1
      val c = if (y > 1.5) 1 else 0
      (i.toLong, k.toLong, x, y, c, i % 7 == 0, i % 11 == 3)
    }.toDF("id", "k", "x", "yT", "cT", "missY", "missC")
      .withColumn("y", when($"missY", lit(null)).otherwise($"yT"))
      .withColumn("c", when($"missC", lit(null)).otherwise($"cT"))
      .repartition(4)
    val chained = MiceJoin.imputeChainedOverJoin(base, dim2, "k",
      MiceJoin.ChainConfig(factNum = Seq("y", "x"), factCat = Seq("c"),
        dimNum = Seq("d1"), imputeCont = Seq("y"), imputeCat = Seq("c"),
        iterations = 2, normalize = false))
    val leaves = chained.queryExecution.analyzed.collect { case l: LogicalRDD => l }
    assert(leaves.nonEmpty, "the chained plan must reference checkpointed generations")
    leaves.foreach { l =>
      assert(l.rdd.getStorageLevel != StorageLevel.NONE,
        s"generation RDD ${l.rdd.id} was unpersisted before the caller consumed the plan")
    }
    assert(chained.count() == 600)
    // ... and the caller's traversal-based release frees exactly those blocks
    Graft.dropCheckpoint(chained)
    leaves.foreach { l =>
      assert(l.rdd.getStorageLevel == StorageLevel.NONE,
        s"Graft.dropCheckpoint(result) must release generation RDD ${l.rdd.id}")
    }
  }
}
