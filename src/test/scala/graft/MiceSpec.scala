package graft

import graft.mice.Mice
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class MiceR(id: Int, a: Double, b: Double, c: Int, bTrue: Double, cTrue: Int,
                 bMiss: Boolean, cMiss: Boolean)

/** End-to-end MICE on synthetic data with seeded MCAR nulls (fixture F5
  * semantics: 20% missing, 5 iterations, main.cpp:52-75): output must be
  * complete and beat mean/mode imputation; both variants must agree. */
class MiceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // correlated data so regression-based imputation can beat the mean
  val rng = new scala.util.Random(31)
  val rows: Seq[MiceR] = Seq.tabulate(600) { i =>
    val a = rng.nextGaussian() * 2 + 10
    val c = if (a > 10) 1 else 0
    val b = 3.0 * a + (if (c == 1) 4.0 else -4.0) + rng.nextGaussian() * 0.8
    MiceR(i, a, b, c, b, c, rng.nextDouble() < 0.2, rng.nextDouble() < 0.2)
  }

  def withNulls = rows.toDF()
    .withColumn("b", when($"bMiss", lit(null)).otherwise($"b"))
    .withColumn("c", when($"cMiss", lit(null)).otherwise($"c"))
    .repartition(4)

  val cfg = Mice.Config(
    contCols = Seq("a", "b"), catCols = Seq("c"),
    imputeCont = Seq("b"), imputeCat = Seq("c"), iterations = 3)

  def quality(out: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val m = out.filter($"bMiss")
      .select(sqrt(avg(pow($"b" - $"bTrue", 2))).as("rmse")).head.getDouble(0)
    val acc = out.filter($"cMiss")
      .select(avg(when($"c" === $"cTrue", 1.0).otherwise(0.0))).head.getDouble(0)
    (m, acc)
  }

  test("baseline MICE: complete output, beats mean/mode imputation") {
    val out = Mice.baseline(withNulls, cfg).cache()
    assert(out.filter($"b".isNull || $"c".isNull).count() == 0)
    val meanRmse = {
      val mean = withNulls.agg(avg($"b")).head.getDouble(0)
      withNulls.filter($"bMiss")
        .select(sqrt(avg(pow(lit(mean) - $"bTrue", 2)))).head.getDouble(0)
    }
    val modeAcc = {
      val mode0 = withNulls.groupBy($"c").count().orderBy(desc("count")).head.getInt(0)
      withNulls.filter($"cMiss")
        .select(avg(when(lit(mode0) === $"cTrue", 1.0).otherwise(0.0))).head.getDouble(0)
    }
    val (rmse, acc) = quality(out)
    assert(rmse < meanRmse * 0.5, s"rmse $rmse vs mean-imputation $meanRmse")
    assert(acc > modeAcc, s"accuracy $acc vs mode $modeAcc")
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("partitioned (delta-algebra) MICE matches baseline quality") {
    val out = Mice.partitioned(withNulls, cfg).cache()
    assert(out.count() == 600)
    assert(out.filter($"b".isNull || $"c".isNull).count() == 0)
    val (rmse, acc) = quality(out)
    assert(rmse < 2.0, s"rmse $rmse")
    assert(acc > 0.9, s"accuracy $acc")
    // the two variants train on the same observed row sets → near-identical imputations
    val base = Mice.baseline(withNulls, cfg).select($"id", $"b".as("b1"))
    val diff = out.select($"id", $"b".as("b2")).join(base, "id")
      .select(max(abs($"b1" - $"b2"))).head.getDouble(0)
    assert(diff < 1e-6, s"max divergence $diff")
  }

  test("catModel=nb imputes categoricals via per-class NB aggregates") {
    val out = Mice.baseline(withNulls, cfg.copy(catModel = "nb")).cache()
    assert(out.filter($"c".isNull).count() == 0)
    val (_, acc) = quality(out)
    assert(acc > 0.85, s"NB-imputation accuracy $acc")
  }

  test("partitioned catModel=nb trains on ALL observed rows and matches baseline") {
    // regression: partitioned used to feed the NB per-class aggregation only
    // the incomplete stratum, silently excluding the fully-observed rows the
    // reference trains on (imputation_base.cpp:21-34)
    val nbCfg = cfg.copy(catModel = "nb")
    val part = Mice.partitioned(withNulls, nbCfg).cache()
    assert(part.filter($"c".isNull).count() == 0)
    val (_, accP) = quality(part)
    val base = Mice.baseline(withNulls, nbCfg).select($"id", $"c".as("cBase"))
    val agree = part.select($"id", $"c".as("cPart")).join(base, "id")
      .select(avg(when($"cPart" === $"cBase", 1.0).otherwise(0.0))).head.getDouble(0)
    assert(agree > 0.99, s"partitioned-vs-baseline NB agreement $agree")
    assert(accP > 0.85, s"partitioned NB accuracy $accP")
  }

  test("stochastic imputation adds calibrated noise") {
    val out = Mice.baseline(withNulls, cfg.copy(stochastic = true)).cache()
    assert(out.filter($"b".isNull).count() == 0)
    val (rmse, _) = quality(out)
    // noisy but still far better than mean imputation (sd(b) ~ 7)
    assert(rmse < 3.0, s"stochastic rmse $rmse")
  }

  test("cofactorMasked: one fused scan equals the separate filtered scans, exactly") {
    // the MICE delta loops' scan fusion (r20): every masked triple must
    // match its filtered-rescan twin value for value — same rows, same
    // per-partition accumulation order
    val df = withNulls.withColumn("b", coalesce($"b", lit(0.0)))
      .withColumn("c", coalesce($"c", lit(0)))
      .withColumn("f1", $"id" % 3 === 0)
      .withColumn("f2", $"id" % 2 === 0)
      .localCheckpoint()
    val num = Seq("a", "b"); val cat = Seq("c")
    for (nb <- Seq(false, true)) {
      val fused = Graft.cofactorMasked(df, num, cat,
        Seq(None, Some($"f1"), Some($"f2"), Some($"f1" && !$"f2")), nb = nb)
      val sep = Seq(
        Graft.cofactor(df, num, cat, nb = nb),
        Graft.cofactor(df.filter($"f1"), num, cat, nb = nb),
        Graft.cofactor(df.filter($"f2"), num, cat, nb = nb),
        Graft.cofactor(df.filter($"f1" && !$"f2"), num, cat, nb = nb))
      fused.zip(sep).zipWithIndex.foreach { case ((m, s), i) =>
        assert(m.n == s.n, s"[$i nb=$nb] n ${m.n} != ${s.n}")
        assert(m.lin.sameElements(s.lin), s"[$i nb=$nb] lin")
        assert(m.quad.sameElements(s.quad), s"[$i nb=$nb] quad")
        assert(m.linCat.sameElements(s.linCat), s"[$i nb=$nb] linCat")
      }
    }
    // a predicate matching nothing yields the empty (zero) triple
    val none = Graft.cofactorMasked(df, num, cat, Seq(Some(lit(false))))
    assert(none.head.n == 0)
  }

  test("dropCheckpoint unpersists exactly the plan's checkpoint RDD") {
    // the MICE loops free each superseded working-set checkpoint
    // deterministically — columns × iterations copies of the fact would
    // otherwise sit in executor storage until the async cleaner runs
    val df = Seq(1, 2, 3).toDF("a").localCheckpoint()
    val id = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.head
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "localCheckpoint must register a persistent RDD")
    Mice.dropCheckpoint(df)
    assert(!spark.sparkContext.getPersistentRDDs.contains(id),
      "dropCheckpoint must unregister the checkpoint's RDD")
  }
}
