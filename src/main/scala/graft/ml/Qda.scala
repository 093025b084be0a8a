package graft.ml

import breeze.linalg.{svd, DenseMatrix, DenseVector}
import graft.ring.Triple
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Quadratic discriminant analysis trained from per-class cofactor
 * triples (`GROUP BY label` aggregates) — reference `qda_train`,
 * ML/qda.cpp:27-328. Per class: covariance Σ_c = M₂c/N_c − μ_c μ_cᵀ,
 * pseudo-inverted by SVD with the reference's 1e-9 singular-value cutoff
 * (qda.cpp:220-242); log-pseudo-determinant from the retained singular
 * values (qda.cpp:233-235). One-hot encoding drops the first category
 * per column to reduce collinearity (qda.cpp:47).
 *
 * Score_c(x) = xᵀ(−½Σ_c⁺)x + (Σ_c⁺μ_c)ᵀx − ½μ_cᵀΣ_c⁺μ_c − ½ log|Σ_c|
 *              + log π_c.
 */
object Qda {

  final case class Model(
      classes: Array[Int],
      quad: Array[Array[Double]],   // per class: row-major d×d  (−½ Σ⁺)
      linear: Array[Array[Double]], // per class: Σ⁺ μ
      consts: Array[Double],
      numCols: Int,
      dict: CatDict) extends Serializable

  private val CUTOFF = 1e-9

  /** @param perClass (label value, triple over the rows of that class) */
  def train(perClass: Seq[(Int, Triple)]): Model = {
    val sorted = perClass.sortBy(_._1)
    val dict = CatDict.fromTriples(sorted.map(_._2), dropFirst = true)
    val nTotal = sorted.map(_._2.n).sum.toDouble
    val numCols = sorted.head._2.numCols
    val d = numCols + dict.dim

    val out = sorted.map { case (_, t) =>
      val mom = new Moments(t, dict)
      val nc = t.n.toDouble
      val mu = mom.sums / nc
      val cov = mom.m2 / nc - mu * mu.t
      // SVD pseudo-inverse with absolute cutoff (qda.cpp:220-242)
      val s = svd(cov)
      val keep = s.S.toArray.map(v => v > CUTOFF)
      val sInv = DenseVector(s.S.toArray.map(v => if (v > CUTOFF) 1.0 / v else 0.0))
      // cov = U diag(S) Vt  =>  cov⁺ = V diag(1/S) Uᵀ
      val pinvCov = s.Vt.t * breeze.linalg.diag(sInv) * s.U.t
      val logDet = s.S.toArray.filter(_ > CUTOFF).map(math.log).sum
      val lin = pinvCov * mu
      val const = -0.5 * (mu dot lin) - 0.5 * logDet + math.log(nc / nTotal)
      (pinvCov * -0.5, lin, const)
    }
    Model(
      sorted.map(_._1).toArray,
      out.map(_._1.t.toArray).toArray, // Breeze is column-major; transpose => row-major
      out.map(_._2.toArray).toArray,
      out.map(_._3).toArray,
      numCols, dict)
  }

  def predictValue(m: Model, num: Array[Double], cat: Array[Int]): Int = {
    val x = Featurize(num, cat, m.numCols, m.dict)
    val d = x.length
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < m.classes.length) {
      val q = m.quad(c); val l = m.linear(c)
      var s = m.consts(c)
      var i = 0
      while (i < d) {
        var rowDot = 0.0
        var j = 0
        while (j < d) { rowDot += q(i * d + j) * x(j); j += 1 }
        s += x(i) * rowDot + l(i) * x(i)
        i += 1
      }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    m.classes(best)
  }

  def predict(m: Model, num: Seq[Column], cat: Seq[Column]): Column = {
    val f = udf((ns: Seq[Double], cs: Seq[Int]) => predictValue(m, ns.toArray, cs.toArray))
    f(org.apache.spark.sql.functions.array(num.map(_.cast("double")): _*),
      org.apache.spark.sql.functions.array(cat.map(_.cast("int")): _*))
  }
}
