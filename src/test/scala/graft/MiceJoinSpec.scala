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
}
