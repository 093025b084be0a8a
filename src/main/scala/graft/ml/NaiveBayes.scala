package graft.ml

import graft.ring.Triple
import org.apache.spark.sql.Column

/**
 * Gaussian + categorical Naive Bayes trained from per-class NB
 * aggregates (reference `nb_train`, ML/naive_bayes.cpp:10-143):
 * prior = N_c/N; per continuous feature mean/variance (+1e-9 jitter,
 * naive_bayes.cpp:111-117); per categorical feature conditional
 * frequencies. Prediction is argmax of
 * log π_c + Σ log N(x; μ, σ²) + Σ log p(cat|c); an unseen category
 * zeroes the class probability (naive_bayes.cpp:236-237).
 */
object NaiveBayes {

  final case class Model(
      classes: Array[Int],
      priors: Array[Double],
      means: Array[Array[Double]],   // per class, per numeric feature
      vars: Array[Array[Double]],
      catFreq: Array[Array[Map[Int, Double]]] // per class, per cat col: category -> p(cat|class)
  ) extends Serializable {
    def numCols: Int = means.headOption.map(_.length).getOrElse(0)
  }

  private val JITTER = 1e-9

  /** @param perClass (label value, NB aggregate over the rows of that class) */
  def train(perClass: Seq[(Int, Triple)]): Model = {
    val sorted = perClass.sortBy(_._1)
    val nTotal = sorted.map(_._2.n).sum.toDouble
    val means = sorted.map { case (_, t) => t.lin.map(_ / t.n) }.toArray
    val vars = sorted.zipWithIndex.map { case ((_, t), ci) =>
      t.quad.zipWithIndex.map { case (q, i) =>
        math.max(0.0, q / t.n - means(ci)(i) * means(ci)(i)) + JITTER
      }
    }.toArray
    val catFreq = sorted.map { case (_, t) =>
      t.linCat.map(m => m.map { case (k, v) => k -> v / t.n })
    }.toArray
    Model(
      sorted.map(_._1).toArray,
      sorted.map(_._2.n / nTotal).toArray,
      means, vars, catFreq)
  }

  def predictValue(m: Model, num: Array[Double], cat: Array[Int]): Int = {
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < m.classes.length) {
      var s = math.log(m.priors(c))
      var i = 0
      while (i < num.length) {
        val v = m.vars(c)(i); val d = num(i) - m.means(c)(i)
        s += -0.5 * math.log(2.0 * math.Pi * v) - d * d / (2.0 * v)
        i += 1
      }
      var j = 0
      while (j < cat.length) {
        s += (m.catFreq(c)(j).get(cat(j)) match {
          case Some(p) => math.log(p)
          case None => Double.NegativeInfinity // unseen category ⇒ probability 0
        })
        j += 1
      }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    m.classes(best)
  }

  /** Pure-Column prediction (whole-stage codegen, no UDF): per class the
    * Gaussian log-densities fold their constants (−½ln 2πσ², 2σ²) into
    * literals, categorical log-frequencies become map lookups (unseen
    * category ⇒ −∞ via coalesce, matching [[predictValue]]), and the
    * argmax ties break toward the first class exactly as the driver-side
    * loop does. */
  def predict(m: Model, num: Seq[Column], cat: Seq[Column]): Column = {
    import org.apache.spark.sql.functions._
    require(num.length == m.numCols, s"expected ${m.numCols} numeric features, got ${num.length}")
    require(m.catFreq.headOption.forall(_.length == cat.length),
      s"expected ${m.catFreq.headOption.map(_.length).getOrElse(0)} categorical features, got ${cat.length}")
    val scores = m.classes.indices.map { c =>
      val base = num.zipWithIndex.foldLeft(lit(math.log(m.priors(c)))) { case (acc, (xc, i)) =>
        val v = m.vars(c)(i)
        val x = xc.cast("double")
        val d = x - lit(m.means(c)(i))
        acc + (lit(-0.5 * math.log(2.0 * math.Pi * v)) - d * d / lit(2.0 * v))
      }
      cat.zipWithIndex.foldLeft(base) { case (acc, (xc, j)) =>
        val logFreq = m.catFreq(c)(j).map { case (k, p) => k -> math.log(p) }
        acc + coalesce(element_at(typedLit(logFreq), xc.cast("int")),
          lit(Double.NegativeInfinity))
      }
    }
    MlPredict.argmaxClass(scores, m.classes)
  }
}
