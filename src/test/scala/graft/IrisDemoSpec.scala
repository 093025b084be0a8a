package graft

import graft.examples.IrisData
import graft.mice.Mice
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference demo contract (main.cpp:40-81): iris-shaped table, 20%
  * seeded MCAR in sepal_length / petal_length / target, 5 MICE
  * iterations over the full column set — imputed output is complete,
  * regression imputation beats the mean baseline on both continuous
  * columns, and class imputation beats the mode baseline. */
class IrisDemoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val n = 150
  lazy val (orig, masked) = IrisData.tables(spark, n)

  def quality(done: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
    val j = done.select($"id", $"sepal_length".as("sl"), $"petal_length".as("pl"),
        $"target".as("tg"))
      .join(orig.select($"id", $"sepal_length", $"petal_length", $"target"), "id")
    val sl = j.filter($"id".isInCollection(IrisData.maskedIds(n, 0)))
      .select(sqrt(avg(pow($"sl" - $"sepal_length", 2)))).head.getDouble(0)
    val pl = j.filter($"id".isInCollection(IrisData.maskedIds(n, 1)))
      .select(sqrt(avg(pow($"pl" - $"petal_length", 2)))).head.getDouble(0)
    val tg = j.filter($"id".isInCollection(IrisData.maskedIds(n, 2)))
      .select(avg(when($"tg" === $"target", 1.0).otherwise(0.0))).head.getDouble(0)
    (sl, pl, tg)
  }

  test("demo contract: complete output, beats mean/mode baselines (goldens)") {
    val done = Mice.baseline(masked, IrisData.config).cache()
    assert(done.count() == n)
    assert(done.filter(
      $"sepal_length".isNull || $"petal_length".isNull || $"target".isNull).count() == 0)

    val (slRmse, plRmse, tgAcc) = quality(done)

    // mean/mode baselines on the same mask
    def meanRmse(c: String, maskCol: Int): Double = {
      val mean = masked.agg(avg(col(c))).head.getDouble(0)
      orig.filter($"id".isInCollection(IrisData.maskedIds(n, maskCol)))
        .select(sqrt(avg(pow(lit(mean) - col(c), 2)))).head.getDouble(0)
    }
    val slMean = meanRmse("sepal_length", 0)
    val plMean = meanRmse("petal_length", 1)
    val mode = masked.groupBy($"target").count()
      .filter($"target".isNotNull).orderBy(desc("count")).head.getInt(0)
    val modeAcc = orig.filter($"id".isInCollection(IrisData.maskedIds(n, 2)))
      .select(avg(when(lit(mode) === $"target", 1.0).otherwise(0.0))).head.getDouble(0)

    assert(slRmse < slMean, s"sepal_length RMSE $slRmse vs mean baseline $slMean")
    assert(plRmse < plMean * 0.5, s"petal_length RMSE $plRmse vs mean baseline $plMean")
    assert(tgAcc > modeAcc, s"target accuracy $tgAcc vs mode baseline $modeAcc")
    // goldens: petal_length is strongly explained by the other features
    // (the demo's "it works" signal); target is ~linearly separable
    assert(plRmse < 0.6, s"petal_length RMSE golden: $plRmse")
    assert(tgAcc > 0.8, s"target accuracy golden: $tgAcc")
  }

  test("partitioned variant matches the demo contract too") {
    val done = Mice.partitioned(masked, IrisData.config).cache()
    assert(done.count() == n)
    assert(done.filter($"target".isNull).count() == 0)
    val (_, plRmse, tgAcc) = quality(done)
    assert(plRmse < 0.6 && tgAcc > 0.8, s"partitioned demo: rmse=$plRmse acc=$tgAcc")
  }
}
