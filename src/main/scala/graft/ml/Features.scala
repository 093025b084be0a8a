package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.ring.Triple

/**
 * One-hot dictionary over the categorical columns of a triple
 * (port of the semantics of `n_cols_1hot_expansion`,
 * reference ML/utils.cpp:520-576): sorted unique categories per column,
 * with `dropFirst` dropping the first (lowest) category per column to
 * avoid collinearity (qda.cpp:47).
 *
 * `cols` are the included categorical column indices (a label column can
 * be excluded); `offsets(k)` is the position of cols(k)'s block inside
 * the one-hot expansion.
 */
final case class CatDict(
    cols: Array[Int],
    cats: Array[Array[Int]],
    offsets: Array[Int],
    dim: Int) {

  /** Position of category `v` of included-col `k` in the expansion, or -1. */
  def pos(k: Int, v: Int): Int = {
    val i = java.util.Arrays.binarySearch(cats(k), v)
    if (i < 0) -1 else offsets(k) + i
  }
}

object CatDict {
  def fromTriples(ts: Seq[Triple], excludeCat: Int = -1, dropFirst: Boolean = false): CatDict = {
    val catCols = ts.head.catCols
    val cols = (0 until catCols).filter(_ != excludeCat).toArray
    val cats = cols.map { j =>
      val all = ts.iterator.flatMap(_.linCat(j).keys).toArray.distinct.sorted
      if (dropFirst && all.length > 0) all.drop(1) else all
    }
    val offsets = cats.scanLeft(0)(_ + _.length)
    CatDict(cols, cats, offsets.dropRight(1), offsets.last)
  }
}

/**
 * Dense first/second moments of the feature vector
 * `[x_1..x_n, onehot(cat cols in dict)]` extracted from a triple — the
 * Σ "sigma matrix" construction of the reference (`build_sigma_matrix`,
 * ML/utils.cpp:176-310) in Breeze form. All math is double precision.
 */
final class Moments(t: Triple, dict: CatDict) {
  val numCols: Int = t.numCols
  val dim: Int = numCols + dict.dim
  def n: Long = t.n

  private val m = t.catCols

  /** Σ x xᵀ (second moment), symmetric. */
  def m2: DenseMatrix[Double] = {
    val M = DenseMatrix.zeros[Double](dim, dim)
    // num × num from the packed upper triangle
    var i = 0
    while (i < numCols) {
      var j = i
      while (j < numCols) {
        val v = t.quad(Triple.triIdx(i, j, numCols))
        M(i, j) = v; M(j, i) = v
        j += 1
      }
      i += 1
    }
    // num × one-hot from quad_num_cat
    var k = 0
    while (k < dict.cols.length) {
      val col = dict.cols(k)
      i = 0
      while (i < numCols) {
        t.quadNumCat(i * m + col).foreach { case (cat, v) =>
          val p = dict.pos(k, cat)
          if (p >= 0) { M(i, numCols + p) = v; M(numCols + p, i) = v }
        }
        i += 1
      }
      k += 1
    }
    // one-hot × one-hot from quad_cat
    k = 0
    while (k < dict.cols.length) {
      var l = k
      while (l < dict.cols.length) {
        val (cj, ck) = (dict.cols(k), dict.cols(l))
        t.quadCat(Triple.pairIdx(cj, ck, m)).foreach { case (key, v) =>
          val p1 = dict.pos(k, Triple.catKey1(key))
          val p2 = dict.pos(l, Triple.catKey2(key))
          if (p1 >= 0 && p2 >= 0) {
            M(numCols + p1, numCols + p2) = v; M(numCols + p2, numCols + p1) = v
          }
        }
        l += 1
      }
      k += 1
    }
    M
  }

  /** Σ x as a vector including the one-hot blocks. */
  def sums: DenseVector[Double] = {
    val v = DenseVector.zeros[Double](dim)
    var i = 0
    while (i < numCols) { v(i) = t.lin(i); i += 1 }
    var k = 0
    while (k < dict.cols.length) {
      t.linCat(dict.cols(k)).foreach { case (cat, cnt) =>
        val p = dict.pos(k, cat)
        if (p >= 0) v(numCols + p) = cnt
      }
      k += 1
    }
    v
  }

  /** Per-class (category of `label`, an excluded cat col) counts and
    * feature sums (port of `build_sum_vector`, lda.cpp:58-144).
    * Returns classes in sorted order. */
  def classSums(label: Int): (Array[Int], Array[Double], Array[DenseVector[Double]]) = {
    val classes = t.linCat(label).keys.toArray.sorted
    val counts = classes.map(t.linCat(label))
    val sums = classes.map { v =>
      val s = DenseVector.zeros[Double](dim)
      var i = 0
      while (i < numCols) {
        s(i) = t.quadNumCat(i * m + label).getOrElse(v, 0.0)
        i += 1
      }
      var k = 0
      while (k < dict.cols.length) {
        val j = dict.cols(k)
        // co-occurrence of (col j = u) with (label = v)
        val (pair, keyOf) =
          if (j < label) (Triple.pairIdx(j, label, m), (u: Int) => Triple.catKey(u, v))
          else (Triple.pairIdx(label, j, m), (u: Int) => Triple.catKey(v, u))
        dict.cats(k).foreach { u =>
          val cnt = t.quadCat(pair).getOrElse(keyOf(u), 0.0)
          if (cnt != 0.0) s(numCols + dict.pos(k, u)) = cnt
        }
        k += 1
      }
      s
    }
    (classes, counts, sums)
  }
}
