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
}
