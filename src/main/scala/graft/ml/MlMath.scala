package graft.ml

import breeze.linalg.{svd, DenseMatrix, DenseVector}

private[graft] object MlMath {
  /**
   * SVD pseudo-inverse with a relative singular-value cutoff
   * (rcond · σ_max). One-hot designs make X'X exactly singular; a proper
   * cutoff yields the true minimum-norm solution where a default-tolerance
   * pinv amplifies ~1e-13 singular values into null-space garbage.
   * (Reference uses dgelsd/dgesvd with an explicit cutoff, qda.cpp:220-242.)
   */
  def pinvCut(m: DenseMatrix[Double], rcond: Double = 1e-9): DenseMatrix[Double] = {
    val s = svd(m)
    val cutoff = rcond * (if (s.S.length > 0) breeze.linalg.max(s.S) else 0.0)
    val sInv = DenseVector(s.S.toArray.map(v => if (v > cutoff) 1.0 / v else 0.0))
    s.Vt.t * breeze.linalg.diag(sInv) * s.U.t
  }

  /** Log pseudo-determinant (sum of logs of retained singular values). */
  def logPseudoDet(m: DenseMatrix[Double], rcond: Double = 1e-9): Double = {
    val s = svd(m).S
    val cutoff = rcond * (if (s.length > 0) breeze.linalg.max(s) else 0.0)
    s.toArray.filter(_ > cutoff).map(math.log).sum
  }

  /**
   * Feature standardization in moment space (the reference's
   * `standardize_sigma`, ML/utils.cpp:580-599): transforms Σ so training
   * operates on (x − μ)/σ features without touching the data, then folds
   * the solution back to raw-feature coefficients. Only the first
   * `numCols` (continuous) features are standardized; one-hot blocks are
   * left unscaled.
   */
  final class Standardizer(sums: DenseVector[Double], m2: DenseMatrix[Double],
                           n: Double, standardize: Int => Boolean) {
    val mu: DenseVector[Double] = sums / n
    val sigma: DenseVector[Double] = DenseVector.tabulate(sums.length) { i =>
      if (!standardize(i)) 1.0
      else {
        val v = m2(i, i) / n - mu(i) * mu(i)
        if (v > 0) math.sqrt(v) else 1.0
      }
    }
    /** Effective shift: μ for standardized dims, 0 for pass-through dims. */
    def muS(i: Int): Double = if (standardize(i)) mu(i) else 0.0

    /** Standardized second moment: Σ' x'_i x'_j. */
    def m2Std: DenseMatrix[Double] = DenseMatrix.tabulate(sums.length, sums.length) { (i, j) =>
      (m2(i, j) - muS(i) * sums(j) - muS(j) * sums(i) + n * muS(i) * muS(j)) / (sigma(i) * sigma(j))
    }

    /** Standardized first moment: Σ x'_i (zero for standardized coords). */
    def sumsStd: DenseVector[Double] = DenseVector.tabulate(sums.length) { i =>
      (sums(i) - n * muS(i)) / sigma(i)
    }

    /** Fold a standardized-space linear form (w', b') back to raw
      * features: w_i = w'_i/σ_i, b = b' − Σ w'_i μ_i/σ_i. */
    def foldback(w: DenseVector[Double], b: Double): (DenseVector[Double], Double) = {
      val wRaw = DenseVector.tabulate(w.length)(i => w(i) / sigma(i))
      val bRaw = b - (0 until w.length).map(i => w(i) * muS(i) / sigma(i)).sum
      (wRaw, bRaw)
    }
  }
}
