package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.ring.Triple
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Ridge linear regression trained purely from a cofactor triple
 * (reference `linreg_train`, ML/regression.cpp:108-354). The reference
 * runs batch gradient descent over the Σ matrix; closed-form normal
 * equations on the same Σ give the identical optimum, so the exact solve
 * is the default here (minimum-norm pseudo-inverse when λ = 0, which
 * matches GD-from-zero on collinear one-hot encodings).
 *
 * Feature layout: `[intercept, nums except label, one-hot of all cats]`.
 */
object LinReg {

  /** Trained parameters (reference layout regression.cpp:313-353, kept
    * as a structured object instead of a self-describing FLOAT[]). */
  final case class Model(
      intercept: Double,
      numCoef: Array[Double],            // per numeric feature, label excluded, original order
      catCoef: Array[Map[Int, Double]],  // per categorical column: category -> coefficient
      sigma2: Double) extends Serializable

  /**
   * @param t        cofactor triple over [nums..., cats...]
   * @param label    index of the label among the numeric columns
   * @param lambda   ridge strength (reference default 0)
   * @param computeVariance also estimate residual σ² (for stochastic imputation)
   * @param normalize standardize continuous features in moment space
   *                  before solving (reference `normalize` flag /
   *                  standardize_sigma; changes the ridge optimum, is a
   *                  no-op for the λ = 0 predictions)
   */
  def train(t: Triple, label: Int, lambda: Double = 0.0, computeVariance: Boolean = true,
            normalize: Boolean = false): Model = {
    require(label >= 0 && label < t.numCols, s"label $label out of numeric range")
    val dict = CatDict.fromTriples(Seq(t))
    val mom = new Moments(t, dict)
    val d = mom.dim
    val n = math.max(t.n, 1L).toDouble

    val rawSums = mom.sums
    val rawM2 = mom.m2
    // standardize continuous features only, never the label (so σ² and
    // the returned coefficients keep their raw scales after foldback)
    val std =
      if (normalize) Some(new MlMath.Standardizer(rawSums, rawM2, n,
        i => i < t.numCols && i != label))
      else None
    val sums = std.map(_.sumsStd).getOrElse(rawSums)
    val m2 = std.map(_.m2Std).getOrElse(rawM2)

    // augmented moment matrix with intercept at index 0
    val a = DenseMatrix.zeros[Double](d + 1, d + 1)
    a(0, 0) = t.n.toDouble
    for (i <- 0 until d) { a(0, i + 1) = sums(i); a(i + 1, 0) = sums(i) }
    for (i <- 0 until d; j <- 0 until d) a(i + 1, j + 1) = m2(i, j)

    val target = 1 + label
    val feats = (0 to d).filter(_ != target).toArray
    val xtx = a(feats.toIndexedSeq, feats.toIndexedSeq).toDenseMatrix
    val xty = DenseVector(feats.map(f => a(f, target)))
    val yty = a(target, target)

    val theta: DenseVector[Double] =
      if (lambda == 0.0) MlMath.pinvCut(xtx) * xty
      else {
        val reg = xtx + (DenseMatrix.eye[Double](feats.length) * (lambda * n))
        reg \ xty
      }

    val sigma2 =
      if (!computeVariance) 0.0
      else math.max(0.0, (yty - 2.0 * (theta dot xty) + (theta dot (xtx * theta))) / n)

    // fold standardized-space coefficients back to raw features
    std.foreach { s =>
      var icpt = theta(0)
      for (k <- 1 until feats.length) {
        val momIdx = feats(k) - 1
        icpt -= theta(k) * s.muS(momIdx) / s.sigma(momIdx)
        theta(k) = theta(k) / s.sigma(momIdx)
      }
      theta(0) = icpt
    }

    unpack(t, dict, feats, theta, sigma2, label)
  }

  /**
   * Reference-parity trainer: batch gradient descent over the Σ matrix
   * (`linreg_train`'s actual solver, ML/regression.cpp:108-263) with
   * Barzilai–Borwein step sizes (compute_step_size, :79-105) and
   * backtracking line search (:205-223). The exact solve above reaches
   * the same optimum; this exists for parity testing and for the
   * stochastic-start semantics of the reference.
   */
  def trainGD(t: Triple, label: Int, stepSize: Double = 1e-3, lambda: Double = 0.0,
              maxIters: Int = 10000, computeVariance: Boolean = true): Model = {
    require(label >= 0 && label < t.numCols, s"label $label out of numeric range")
    val dict = CatDict.fromTriples(Seq(t))
    val mom = new Moments(t, dict)
    val d = mom.dim
    val n = math.max(t.n, 1L).toDouble

    val a = DenseMatrix.zeros[Double](d + 1, d + 1)
    a(0, 0) = t.n.toDouble
    val sums = mom.sums; val m2 = mom.m2
    for (i <- 0 until d) { a(0, i + 1) = sums(i); a(i + 1, 0) = sums(i) }
    for (i <- 0 until d; j <- 0 until d) a(i + 1, j + 1) = m2(i, j)
    val target = 1 + label
    val feats = (0 to d).filter(_ != target).toArray
    val xtx = a(feats.toIndexedSeq, feats.toIndexedSeq).toDenseMatrix
    val xty = DenseVector(feats.map(f => a(f, target)))
    val yty = a(target, target)

    def grad(th: DenseVector[Double]): DenseVector[Double] =
      (xtx * th - xty) / n + th * lambda
    def loss(th: DenseVector[Double]): Double =
      ((th dot (xtx * th)) - 2.0 * (th dot xty) + yty) / (2.0 * n) +
        0.5 * lambda * (th dot th)

    var theta = DenseVector.zeros[Double](feats.length)
    var prevTheta: DenseVector[Double] = null
    var prevGrad: DenseVector[Double] = null
    var it = 0
    var done = false
    while (it < maxIters && !done) {
      val g = grad(theta)
      // Barzilai–Borwein step after the first iteration (regression.cpp:79-105)
      var alpha =
        if (prevTheta == null) stepSize
        else {
          val s = theta - prevTheta
          val y = g - prevGrad
          val sy = s dot y
          if (sy > 1e-300) (s dot s) / sy else stepSize
        }
      // backtracking line search (regression.cpp:205-223)
      val l0 = loss(theta)
      val gNorm2 = g dot g
      var tries = 0
      while (tries < 50 && loss(theta - g * alpha) > l0 - 0.5 * alpha * gNorm2) {
        alpha *= 0.5; tries += 1
      }
      prevTheta = theta.copy; prevGrad = g
      theta = theta - g * alpha
      // convergence on relative parameter change (regression.cpp:225-231)
      val delta = breeze.linalg.norm(theta - prevTheta)
      if (delta <= 1e-12 * math.max(1.0, breeze.linalg.norm(theta))) done = true
      it += 1
    }

    val sigma2 =
      if (!computeVariance) 0.0
      else math.max(0.0, (yty - 2.0 * (theta dot xty) + (theta dot (xtx * theta))) / n)
    unpack(t, dict, feats, theta, sigma2, label)
  }

  private def unpack(t: Triple, dict: CatDict, feats: Array[Int],
                     theta: DenseVector[Double], sigma2: Double, label: Int): Model = {
    val numCoef = new Array[Double](t.numCols - 1)
    var fi = 1
    for (i <- 0 until t.numCols if i != label) {
      numCoef(if (i < label) i else i - 1) = theta(fi); fi += 1
    }
    val catCoef = dict.cols.indices.map { k =>
      dict.cats(k).zipWithIndex.map { case (cat, ci) =>
        cat -> theta(1 + (t.numCols - 1) + dict.offsets(k) + ci)
      }.toMap
    }.toArray
    Model(theta(0), numCoef, catCoef, sigma2)
  }

  /**
   * Prediction as a pure Column expression (codegen-friendly; reference
   * `linreg_predict`/`linreg_impute`, regression.cpp:397-509). `num` are
   * the numeric feature columns (training order, label excluded), `cat`
   * the categorical columns. Unknown categories contribute 0. With
   * `addNoise`, adds Box–Muller Gaussian noise scaled by the trained σ
   * (stochastic regression imputation) via `randn(seed)`.
   */
  def predict(m: Model, num: Seq[Column], cat: Seq[Column],
              addNoise: Boolean = false, seed: Long = 42L): Column = {
    require(num.length == m.numCoef.length, s"expected ${m.numCoef.length} numeric feature columns")
    require(cat.length == m.catCoef.length, s"expected ${m.catCoef.length} categorical feature columns")
    val numTerm = num.zip(m.numCoef).map { case (c, w) => c.cast("double") * lit(w) }
    val catTerm = cat.zip(m.catCoef).map { case (c, mp) =>
      if (mp.isEmpty) lit(0.0)
      else coalesce(element_at(typedLit(mp), c.cast("int")), lit(0.0))
    }
    val base = (numTerm ++ catTerm).foldLeft(lit(m.intercept))(_ + _)
    if (addNoise) base + randn(seed) * lit(math.sqrt(m.sigma2)) else base
  }
}
