package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.ring.Triple
import org.apache.spark.sql.Column

/** Shared helpers for the discriminative models. */
private[ml] object Featurize {
  /** Build the dense feature vector `[nums, one-hot(cats)]`; unknown
    * categories leave their block all-zero (lda.cpp:451-502). */
  def apply(num: Array[Double], cat: Array[Int], numCols: Int, dict: CatDict): DenseVector[Double] = {
    val x = DenseVector.zeros[Double](numCols + dict.dim)
    var i = 0
    while (i < numCols) { x(i) = num(i); i += 1 }
    var k = 0
    while (k < dict.cols.length) {
      val p = dict.pos(k, cat(k))
      if (p >= 0) x(numCols + p) = 1.0
      k += 1
    }
    x
  }
}

/**
 * Linear discriminant analysis (lsqr-style solver) trained from one
 * cofactor triple — no second pass over the data (reference `lda_train`,
 * ML/lda.cpp:154-416).
 *
 * Pooled within-class covariance S = (M₂ − Σ_c N_c μ_c μ_cᵀ)/N with
 * optional shrinkage (1−s)·S + s·(tr(S)/p)·I (lda.cpp:259-273);
 * coef_c = S⁺ μ_c, intercept_c = −½ μ_cᵀ coef_c + log π_c
 * (lda.cpp:283-320).
 */
object Lda {

  final case class Model(
      classes: Array[Int],
      coef: Array[Array[Double]],      // per class, per feature
      intercepts: Array[Double],
      numCols: Int,
      dict: CatDict) extends Serializable

  /** @param label index of the label among the categorical columns
    * @param normalize standardize continuous features in moment space
    *                  before the covariance solve (reference `normalize`
    *                  flag; changes the shrinkage geometry) */
  def train(t: Triple, label: Int, shrinkage: Double = 0.0, normalize: Boolean = false): Model = {
    require(label >= 0 && label < t.catCols, s"label $label out of categorical range")
    val dict = CatDict.fromTriples(Seq(t), excludeCat = label)
    val mom = new Moments(t, dict)
    val d = mom.dim
    val n = t.n.toDouble
    val (classes, counts, rawSums) = mom.classSums(label)

    val std =
      if (normalize) Some(new MlMath.Standardizer(mom.sums, mom.m2, n, i => i < t.numCols))
      else None
    val m2 = std.map(_.m2Std).getOrElse(mom.m2)
    // class sums in standardized coordinates: Σ_c x' = (Σ_c x − N_c μ)/σ
    val sums = std match {
      case None => rawSums
      case Some(s) => rawSums.zip(counts).map { case (cs, nc) =>
        DenseVector.tabulate(d)(i => (cs(i) - nc * s.muS(i)) / s.sigma(i))
      }
    }
    val mus = sums.zip(counts).map { case (cs, c) => cs / c }

    val scatter = m2.copy
    for (((mu, c), _) <- mus.zip(counts).zipWithIndex)
      scatter -= (mu * mu.t) * c
    var s = scatter / n
    if (shrinkage > 0.0) {
      val muI = breeze.linalg.trace(s) / d
      s = s * (1.0 - shrinkage) + DenseMatrix.eye[Double](d) * (shrinkage * muI)
    }
    val sInv = MlMath.pinvCut(s)
    val coefStd = mus.map(mu => sInv * mu)
    val interceptsStd = classes.indices.map { c =>
      -0.5 * (mus(c) dot coefStd(c)) + math.log(counts(c) / n)
    }
    // fold standardized-space scores back to raw features
    val (coef, intercepts) = std match {
      case None => (coefStd, interceptsStd.toArray)
      case Some(s) =>
        val folded = coefStd.zip(interceptsStd).map { case (w, b) => s.foldback(w, b) }
        (folded.map(_._1), folded.map(_._2).toArray)
    }
    Model(classes, coef.map(_.toArray), intercepts, t.numCols, dict)
  }

  def predictValue(m: Model, num: Array[Double], cat: Array[Int]): Int = {
    val x = Featurize(num, cat, m.numCols, m.dict)
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < m.classes.length) {
      val w = m.coef(c)
      var s = m.intercepts(c)
      var i = 0
      while (i < w.length) { s += w(i) * x(i); i += 1 }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    m.classes(best)
  }

  /** Row-wise prediction as a pure Column expression (whole-stage
    * codegen; no UDF serialization): arguments are the numeric feature
    * columns then the categorical feature columns (label excluded), as in
    * `lda_predict` (lda.cpp:421-590). Model constants fold into literals;
    * each one-hot block contributes via a map lookup on the category
    * value (unknown category ⇒ 0, the all-zero block). Term order matches
    * [[predictValue]] bit-for-bit, so ties break identically. */
  def predict(m: Model, num: Seq[Column], cat: Seq[Column]): Column = {
    require(num.length == m.numCols, s"expected ${m.numCols} numeric features, got ${num.length}")
    require(cat.length == m.dict.cols.length,
      s"expected ${m.dict.cols.length} categorical features, got ${cat.length}")
    import org.apache.spark.sql.functions._
    val scores = m.classes.indices.map { c =>
      val base = num.zipWithIndex.foldLeft(lit(m.intercepts(c))) { case (acc, (x, i)) =>
        acc + x.cast("double") * lit(m.coef(c)(i))
      }
      cat.zipWithIndex.foldLeft(base) { case (acc, (x, k)) =>
        val entries = m.dict.cats(k).map(v => v -> m.coef(c)(m.numCols + m.dict.pos(k, v))).toMap
        if (entries.isEmpty) acc
        else acc + coalesce(element_at(typedLit(entries), x.cast("int")), lit(0.0))
      }
    }
    MlPredict.argmaxClass(scores, m.classes)
  }
}

/** Shared pure-Column argmax over per-class score expressions. */
private[ml] object MlPredict {
  import org.apache.spark.sql.functions._
  /** `classes(argmax(scores))`, ties broken toward the FIRST class (the
    * driver-side predictValue convention): array_max compares structs
    * lexicographically, so (score, −index) picks the smallest index among
    * equal scores. */
  def argmaxClass(scores: Seq[Column], classes: Array[Int]): Column = {
    val packed = array(scores.zipWithIndex.map { case (s, c) =>
      struct(s.as("s"), lit(-c).as("ni"))
    }: _*)
    val bestIdx = -array_max(packed).getField("ni")
    element_at(typedLit(classes.toSeq), bestIdx + 1)
  }
}
