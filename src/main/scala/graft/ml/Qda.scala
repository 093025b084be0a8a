package graft.ml

import breeze.linalg.{svd, DenseMatrix, DenseVector}
import graft.ring.Triple
import org.apache.spark.sql.Column

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

  /** @param perClass (label value, triple over the rows of that class)
    * @param normalize standardize continuous features using the global
    *                  (all-class) moments before the per-class SVD; the
    *                  quadratic form is folded back to raw features */
  def train(perClass: Seq[(Int, Triple)], normalize: Boolean = false): Model = {
    val sorted = perClass.sortBy(_._1)
    val dict = CatDict.fromTriples(sorted.map(_._2), dropFirst = true)
    val nTotal = sorted.map(_._2.n).sum.toDouble
    val numCols = sorted.head._2.numCols
    val d = numCols + dict.dim

    val std = if (!normalize) None else {
      val all = sorted.map(_._2).reduce(Triple.add)
      val momAll = new Moments(all, dict)
      Some(new MlMath.Standardizer(momAll.sums, momAll.m2, nTotal, i => i < numCols))
    }

    val out = sorted.map { case (_, t) =>
      val mom = new Moments(t, dict)
      val nc = t.n.toDouble
      val (muRaw, covRaw) = {
        val m = mom.sums / nc
        (m, mom.m2 / nc - m * m.t)
      }
      // standardized coordinates: x' = (x − μg)/σg (global shift/scale)
      val (mu, cov) = std match {
        case None => (muRaw, covRaw)
        case Some(s) =>
          val m = DenseVector.tabulate(d)(i => (muRaw(i) - s.muS(i)) / s.sigma(i))
          val c = DenseMatrix.tabulate(d, d)((i, j) => covRaw(i, j) / (s.sigma(i) * s.sigma(j)))
          (m, c)
      }
      // SVD pseudo-inverse with absolute cutoff (qda.cpp:220-242)
      val s = svd(cov)
      val keep = s.S.toArray.map(v => v > CUTOFF)
      val sInv = DenseVector(s.S.toArray.map(v => if (v > CUTOFF) 1.0 / v else 0.0))
      // cov = U diag(S) Vt  =>  cov⁺ = V diag(1/S) Uᵀ
      val pinvCov = s.Vt.t * breeze.linalg.diag(sInv) * s.U.t
      val logDet = s.S.toArray.filter(_ > CUTOFF).map(math.log).sum
      val lin = pinvCov * mu
      val const = -0.5 * (mu dot lin) - 0.5 * logDet + math.log(nc / nTotal)
      val qStd = pinvCov * -0.5
      std match {
        case None => (qStd, lin, const)
        case Some(sz) =>
          // fold x' = D(x − μg) back: Q = DQ'D, l = Dl' − 2DQ'Dμg,
          // c = c' + μg'(DQ'D)μg − l'·Dμg
          val dInv = breeze.linalg.diag(DenseVector.tabulate(d)(i => 1.0 / sz.sigma(i)))
          val muG = DenseVector.tabulate(d)(i => sz.muS(i))
          val qRaw = dInv * qStd * dInv
          val lRaw = dInv * lin - (qRaw * muG) * 2.0
          val cRaw = const + (muG dot (qRaw * muG)) - (lin dot (dInv * muG))
          (qRaw, lRaw, cRaw)
      }
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

  /** Row-wise prediction as a pure Column expression (whole-stage
    * codegen; no UDF serialization). The quadratic form folds into
    * literal terms per class; a one-hot block has exactly one active
    * cell per categorical value, so its contributions are MAP LOOKUPS
    * on the category: diagonal + linear collapse to one lookup per cat
    * column, numeric×one-hot cross terms to one lookup per (numeric,
    * cat) pair, and cat×cat cross terms to a nested two-level lookup.
    * An unknown category is the all-zero block ⇒ every lookup
    * coalesces to 0, matching [[predictValue]]'s Featurize. */
  def predict(m: Model, num: Seq[Column], cat: Seq[Column]): Column = {
    import org.apache.spark.sql.functions._
    require(num.length == m.numCols, s"expected ${m.numCols} numeric features, got ${num.length}")
    require(cat.length == m.dict.cols.length,
      s"expected ${m.dict.cols.length} categorical features, got ${cat.length}")
    val n = m.numCols
    val d = n + m.dict.dim
    val xs = num.map(_.cast("double"))
    val cs = cat.map(_.cast("int"))
    val scores = m.classes.indices.map { c =>
      val q = m.quad(c); val l = m.linear(c)
      var acc = lit(m.consts(c))
      for (i <- 0 until n) acc = acc + lit(l(i)) * xs(i)
      for (i <- 0 until n; j <- i until n) {
        val coef = if (i == j) q(i * d + i) else q(i * d + j) + q(j * d + i)
        acc = acc + lit(coef) * xs(i) * xs(j)
      }
      for (k <- cs.indices; if m.dict.cats(k).nonEmpty) {
        // one-hot diagonal (h² = h) + linear term, one lookup
        val diag = m.dict.cats(k).map { v =>
          val p = n + m.dict.pos(k, v)
          v -> (q(p * d + p) + l(p))
        }.toMap
        acc = acc + coalesce(element_at(typedLit(diag), cs(k)), lit(0.0))
        // numeric × one-hot cross terms
        for (i <- 0 until n) {
          val cross = m.dict.cats(k).map { v =>
            val p = n + m.dict.pos(k, v)
            v -> (q(i * d + p) + q(p * d + i))
          }.toMap
          acc = acc + xs(i) * coalesce(element_at(typedLit(cross), cs(k)), lit(0.0))
        }
        // one-hot × one-hot cross terms between different cat columns
        for (k2 <- k + 1 until cs.length; if m.dict.cats(k2).nonEmpty) {
          val nested = m.dict.cats(k).map { v =>
            val p = n + m.dict.pos(k, v)
            v -> m.dict.cats(k2).map { w =>
              val p2 = n + m.dict.pos(k2, w)
              w -> (q(p * d + p2) + q(p2 * d + p))
            }.toMap
          }.toMap
          acc = acc + coalesce(
            element_at(element_at(typedLit(nested), cs(k)), cs(k2)), lit(0.0))
        }
      }
      acc
    }
    MlPredict.argmaxClass(scores, m.classes)
  }
}
