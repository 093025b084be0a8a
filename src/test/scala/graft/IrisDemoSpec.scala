package graft

import graft.examples.IrisData
import graft.mice.Mice
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iris row with KBins-discretized categorical features (test_LDA.py's
  * in_data_cat shape). */
case class IrisEnc(id: Int, pw: Double, sl: Int, sw: Int, pl: Int, target: Int)

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

  /** Port of the reference's sklearn cross-check scenario
    * (test_LDA.py:94-197 `test_lda_no_norm_cat`): three features
    * KBins-discretized to 4 uniform bins become CATEGORICAL (one-hot via
    * the triple's dictionary), LDA trains on the train split with
    * shrinkage 0.01, and test-set accuracy must equal — to 3 decimals,
    * the test's assertion — an independently-computed LDA on the explicit
    * get_dummies design matrix (Breeze standing in for sklearn's lsqr
    * solver, which uses the same pooled-covariance + shrinkage formula). */
  test("LDA with discretized categorical features: accuracy parity vs explicit one-hot LDA") {
    import breeze.linalg.{pinv, DenseMatrix, DenseVector}
    val all = IrisData.rows(n)
    // KBins(strategy=uniform, n_bins=4) fit on the FULL data, as in in_data_cat
    def bins(xs: Seq[Double]): Double => Int = {
      val (lo, hi) = (xs.min, xs.max)
      x => math.min(3, ((x - lo) / (hi - lo) * 4).toInt)
    }
    val (bSl, bSw, bPl) = (bins(all.map(_.sepal_length)),
      bins(all.map(_.sepal_width)), bins(all.map(_.petal_length)))
    val enc = all.map(r => IrisEnc(r.id, r.petal_width,
      bSl(r.sepal_length), bSw(r.sepal_width), bPl(r.petal_length), r.target))
    val (test, train) = enc.partition(r => (r.id / 3) % 3 == 0) // 1/3 test, class-balanced

    // graft path: triple with 3 categorical features + label, train, predict
    val trainDf = train.toDF()
    val t = Graft.cofactor(trainDf, Seq("pw"), Seq("sl", "sw", "pl", "target"))
    val m = graft.ml.Lda.train(t, label = 3, shrinkage = 0.01)
    val pred = test.toDF().select($"id", $"target",
        graft.ml.Lda.predict(m, Seq($"pw"), Seq($"sl", $"sw", $"pl")).as("pred"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    val accGraft = pred.count(p => p._1 == p._2).toDouble / pred.length

    // "sklearn" path: explicit one-hot design matrix (categories from the
    // train split, sorted — the dictionary's convention), same formula
    val cats = Seq(train.map(_.sl), train.map(_.sw), train.map(_.pl))
      .map(_.distinct.sorted.toArray)
    val d = 1 + cats.map(_.length).sum
    def feat(r: IrisEnc): DenseVector[Double] = {
      val x = DenseVector.zeros[Double](d)
      x(0) = r.pw
      var off = 1
      for ((cs, v) <- cats.zip(Seq(r.sl, r.sw, r.pl))) {
        val p = java.util.Arrays.binarySearch(cs, v)
        if (p >= 0) x(off + p) = 1.0
        off += cs.length
      }
      x
    }
    val byClass = train.groupBy(_.target).toSeq.sortBy(_._1)
    val nTr = train.size.toDouble
    val mus = byClass.map { case (c, rs) =>
      c -> (rs.map(feat).reduce(_ + _) / rs.size.toDouble)
    }
    val scatter = DenseMatrix.zeros[Double](d, d)
    train.foreach { r =>
      val diff = feat(r) - mus.find(_._1 == r.target).get._2
      scatter += diff * diff.t
    }
    var cov = scatter / nTr
    val sh = 0.01
    cov = cov * (1.0 - sh) + DenseMatrix.eye[Double](d) * (sh * breeze.linalg.trace(cov) / d)
    val covInv = pinv(cov)
    val models = mus.map { case (c, mu) =>
      val w = covInv * mu
      (c, w, -0.5 * (mu dot w) + math.log(byClass.find(_._1 == c).get._2.size / nTr))
    }
    val accOracle = test.count { r =>
      val x = feat(r)
      models.maxBy { case (_, w, b) => (w dot x) + b }._1 == r.target
    }.toDouble / test.size

    assert(math.abs(accGraft - accOracle) < 5e-4,
      s"accuracy parity: graft=$accGraft vs one-hot oracle=$accOracle")
    assert(accGraft > 0.85, s"golden: discretized-LDA accuracy $accGraft")
  }
}
