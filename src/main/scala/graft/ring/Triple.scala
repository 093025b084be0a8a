package graft.ring

/**
 * Degree-2 ring aggregate ("cofactor triple") over a set of rows with
 * `numCols` continuous and `catCols` categorical columns.
 *
 * Semantics follow the reference extension's triple type
 * (see /root/reference/duckdb_extension/src/triple/lift.cpp:254-283 and
 * sum/sum.cpp:26-52): count, per-column sums, all pairwise products
 * (packed upper triangle), and sparse maps for the categorical parts.
 *
 * Layout:
 *  - `quad` is the packed upper triangle, row-major with j >= i:
 *    index(i,j) = i*numCols - i*(i+1)/2 + j   (lift.cpp:119-136)
 *  - `quadNumCat(i*catCols + j)` maps category -> Σ x_i over rows with
 *    that category in cat col j (lift.cpp:156-176)
 *  - `quadCat(pairIdx(j,k))` for k >= j maps packed (c1,c2) key ->
 *    co-occurrence count (lift.cpp:199-219). Keys pack as
 *    (c1.toLong << 32) | c2; lexicographic (c1,c2) order == Long order
 *    for non-negative categories.
 *
 * Triples form a commutative ring: `add` = union of row sets,
 * `subtract` = removal (delta maintenance), `multiply` = the triple of a
 * cross product of two row sets (factorized join aggregation,
 * mul.cpp:19-611).
 */
final case class Triple(
    n: Long,
    lin: Array[Double],
    quad: Array[Double],
    linCat: Array[Map[Int, Double]],
    quadNumCat: Array[Map[Int, Double]],
    quadCat: Array[Map[Long, Double]]
) {
  def numCols: Int = lin.length
  def catCols: Int = linCat.length

  // element-wise == so -0.0 equals 0.0 (products of signed zeros)
  private def deq(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.indices.forall(i => a(i) == b(i))

  override def equals(o: Any): Boolean = o match {
    case t: Triple =>
      n == t.n && deq(lin, t.lin) && deq(quad, t.quad) &&
        linCat.toSeq == t.linCat.toSeq &&
        quadNumCat.toSeq == t.quadNumCat.toSeq &&
        quadCat.toSeq == t.quadCat.toSeq
    case _ => false
  }
  override def hashCode: Int = (n, lin.toSeq, quad.toSeq).hashCode

  /** Approximate equality for float-accumulation tolerance tests. */
  def approxEquals(t: Triple, tol: Double = 1e-9): Boolean = {
    def aeq(a: Array[Double], b: Array[Double]) =
      a.length == b.length && a.indices.forall(i => math.abs(a(i) - b(i)) <= tol * (1 + math.abs(a(i))))
    def meq[K](a: Array[Map[K, Double]], b: Array[Map[K, Double]]) =
      a.length == b.length && a.indices.forall { i =>
        a(i).keySet == b(i).keySet && a(i).forall { case (k, v) => math.abs(v - b(i)(k)) <= tol * (1 + math.abs(v)) }
      }
    n == t.n && aeq(lin, t.lin) && aeq(quad, t.quad) &&
      meq(linCat, t.linCat) && meq(quadNumCat, t.quadNumCat) && meq(quadCat, t.quadCat)
  }
}

object Triple {

  /** Packed upper-triangle index, j >= i (utils.cpp:192-199). */
  @inline def triIdx(i: Int, j: Int, n: Int): Int = i * n - i * (i + 1) / 2 + j

  /** Pair index over categorical columns, k >= j. */
  @inline def pairIdx(j: Int, k: Int, m: Int): Int = triIdx(j, k, m)

  /** Pack a categorical key pair; Long order == (c1,c2) lexicographic for c >= 0. */
  @inline def catKey(c1: Int, c2: Int): Long = (c1.toLong << 32) | (c2 & 0xffffffffL)
  @inline def catKey1(k: Long): Int = (k >>> 32).toInt
  @inline def catKey2(k: Long): Int = (k & 0xffffffffL).toInt

  def zero(numCols: Int, catCols: Int): Triple = Triple(
    0L,
    new Array[Double](numCols),
    new Array[Double](numCols * (numCols + 1) / 2),
    Array.fill(catCols)(Map.empty[Int, Double]),
    Array.fill(numCols * catCols)(Map.empty[Int, Double]),
    Array.fill(catCols * (catCols + 1) / 2)(Map.empty[Long, Double])
  )

  /** Per-row lift: the triple of a single row (lift.cpp:15-243). */
  def lift(num: Array[Double], cat: Array[Int]): Triple = {
    val n = num.length; val m = cat.length
    val quad = new Array[Double](n * (n + 1) / 2)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) { quad(triIdx(i, j, n)) = num(i) * num(j); j += 1 }
      i += 1
    }
    val linCat = Array.tabulate(m)(j => Map(cat(j) -> 1.0))
    // canonical form: exact-zero values are never stored in sparse maps
    val quadNumCat = Array.tabulate(n * m) { idx =>
      if (num(idx / m) == 0.0) Map.empty[Int, Double] else Map(cat(idx % m) -> num(idx / m))
    }
    val quadCat = new Array[Map[Long, Double]](m * (m + 1) / 2)
    var j = 0
    while (j < m) {
      var k = j
      while (k < m) { quadCat(pairIdx(j, k, m)) = Map(catKey(cat(j), cat(k)) -> 1.0); k += 1 }
      j += 1
    }
    Triple(1L, num.clone(), quad, linCat, quadNumCat, quadCat)
  }

  // Comparison-based merge, never hash-based: every diagonal packed
  // pair key (v<<32)|v has Long.hashCode 0 (hi ^ lo folds to zero), so
  // a HashMap holding them degenerates to ONE collision node and a
  // per-entry getOrElse/updated fold goes O(m²) — measured at ~17 s for
  // one 20k-category triple merge chain. A TreeMap only ever compares
  // keys, so correlated key structure cannot slow it down; its sorted
  // iteration is also exactly the documented map emission order.
  private def mergeMaps[K: Ordering](a: Map[K, Double], b: Map[K, Double],
                                     sign: Double): Map[K, Double] = {
    val out = scala.collection.mutable.TreeMap.empty[K, Double]
    a.foreach { case (k, v) => if (v != 0.0) out.update(k, v) }
    b.foreach { case (k, v) =>
      val nv = out.getOrElse(k, 0.0) + sign * v
      if (nv == 0.0) out.remove(k) else out.update(k, nv)
    }
    scala.collection.immutable.TreeMap.from(out)
  }

  private def combine(a: Triple, b: Triple, sign: Double): Triple = {
    require(a.numCols == b.numCols && a.catCols == b.catCols,
      s"shape mismatch: (${a.numCols},${a.catCols}) vs (${b.numCols},${b.catCols})")
    Triple(
      a.n + sign.toLong * b.n,
      Array.tabulate(a.lin.length)(i => a.lin(i) + sign * b.lin(i)),
      Array.tabulate(a.quad.length)(i => a.quad(i) + sign * b.quad(i)),
      Array.tabulate(a.linCat.length)(i => mergeMaps(a.linCat(i), b.linCat(i), sign)),
      Array.tabulate(a.quadNumCat.length)(i => mergeMaps(a.quadNumCat(i), b.quadNumCat(i), sign)),
      Array.tabulate(a.quadCat.length)(i => mergeMaps(a.quadCat(i), b.quadCat(i), sign))
    )
  }

  /** Ring addition: triple of the union of the two row sets (sum.cpp:263-461). */
  def add(a: Triple, b: Triple): Triple = combine(a, b, 1.0)

  /** Ring subtraction: delta maintenance (imputation/triple/sub.cpp:71-217).
    * Entries that reach exactly 0 are dropped so sub(add(a,b),b) == a on
    * integer-valued data. */
  def subtract(a: Triple, b: Triple): Triple = combine(a, b, -1.0)

  /** Per-class ring addition of two (label, triple) sets: matching labels
    * are [[add]]ed, labels present on only one side pass through (a class
    * can live entirely in one stratum). Sorted by label. Generic over the
    * label type so the Int-keyed ML surface and the Long-keyed grouped
    * kernel (wide string / long group keys) share one merge. */
  def addPerClass[K](a: Seq[(K, Triple)], b: Seq[(K, Triple)])
                    (implicit ord: Ordering[K]): Seq[(K, Triple)] = {
    val am = a.toMap; val bm = b.toMap
    (am.keySet ++ bm.keySet).toSeq.sorted.map { k =>
      (am.get(k), bm.get(k)) match {
        case (Some(x), Some(y)) => k -> add(x, y)
        case (Some(x), None)    => k -> x
        case (None, Some(y))    => k -> y
        case _                  => throw new IllegalStateException("unreachable")
      }
    }
  }

  /**
   * Ring product: the triple of the cross product of the two row sets
   * (mul.cpp:19-611; block layout verified against the reference golden
   * test/python/test_mul.py:24-27). Result has n1+n2 continuous and
   * m1+m2 categorical columns (A's columns first).
   */
  def multiply(a: Triple, b: Triple): Triple = {
    val n1 = a.numCols; val n2 = b.numCols; val n = n1 + n2
    val m1 = a.catCols; val m2 = b.catCols; val m = m1 + m2
    val na = a.n.toDouble; val nb = b.n.toDouble

    val lin = new Array[Double](n)
    var i = 0
    while (i < n1) { lin(i) = a.lin(i) * nb; i += 1 }
    while (i < n) { lin(i) = b.lin(i - n1) * na; i += 1 }

    val quad = new Array[Double](n * (n + 1) / 2)
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        quad(triIdx(i, j, n)) =
          if (j < n1) a.quad(triIdx(i, j, n1)) * nb
          else if (i < n1) a.lin(i) * b.lin(j - n1)
          else b.quad(triIdx(i - n1, j - n1, n2)) * na
        j += 1
      }
      i += 1
    }

    // TreeMap result for the same hash-degeneracy reason as mergeMaps
    def scale[K: Ordering](mp: Map[K, Double], s: Double): Map[K, Double] =
      if (s == 0.0) scala.collection.immutable.TreeMap.empty[K, Double]
      else scala.collection.immutable.TreeMap.from(
        mp.iterator.collect { case (k, v) if v * s != 0.0 => k -> v * s })

    val linCat = Array.tabulate(m) { j =>
      if (j < m1) scale(a.linCat(j), nb) else scale(b.linCat(j - m1), na)
    }

    val quadNumCat = Array.tabulate(n * m) { idx =>
      val ni = idx / m; val cj = idx % m
      if (ni < n1) {
        if (cj < m1) scale(a.quadNumCat(ni * m1 + cj), nb)
        else scale(b.linCat(cj - m1), a.lin(ni)) // cross: Σx_A per B-category count
      } else {
        if (cj < m1) scale(a.linCat(cj), b.lin(ni - n1))
        else scale(b.quadNumCat((ni - n1) * m2 + (cj - m1)), na)
      }
    }

    val quadCat = new Array[Map[Long, Double]](m * (m + 1) / 2)
    var j = 0
    while (j < m) {
      var k = j
      while (k < m) {
        quadCat(pairIdx(j, k, m)) =
          if (k < m1) scale(a.quadCat(pairIdx(j, k, m1)), nb)
          else if (j < m1) {
            // cross product of the two category histograms (mul.cpp:542-598)
            val out = scala.collection.immutable.TreeMap.newBuilder[Long, Double]
            a.linCat(j).foreach { case (c1, v1) =>
              b.linCat(k - m1).foreach { case (c2, v2) => out += catKey(c1, c2) -> v1 * v2 }
            }
            out.result()
          } else scale(b.quadCat(pairIdx(j - m1, k - m1, m2)), na)
        k += 1
      }
      j += 1
    }
    Triple(a.n * b.n, lin, quad, linCat, quadNumCat, quadCat)
  }

  /**
   * Column permutation: the triple of the same rows with columns
   * reordered. `numPerm(i)` / `catPerm(j)` give the source index of the
   * i-th output continuous / j-th output categorical column. Lets
   * factorized results (block layout [left ++ right]) be re-shaped to
   * any requested column order.
   */
  def permute(t: Triple, numPerm: Array[Int], catPerm: Array[Int]): Triple = {
    val n = t.numCols; val m = t.catCols
    require(numPerm.sorted.sameElements(Array.range(0, n)), "numPerm must be a permutation")
    require(catPerm.sorted.sameElements(Array.range(0, m)), "catPerm must be a permutation")
    val quad = new Array[Double](t.quad.length)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        val (a, b) = (numPerm(i), numPerm(j))
        quad(triIdx(i, j, n)) = t.quad(triIdx(math.min(a, b), math.max(a, b), n))
        j += 1
      }
      i += 1
    }
    val quadCat = new Array[Map[Long, Double]](t.quadCat.length)
    var j = 0
    while (j < m) {
      var k = j
      while (k < m) {
        val (a, b) = (catPerm(j), catPerm(k))
        quadCat(pairIdx(j, k, m)) =
          if (a <= b) t.quadCat(pairIdx(a, b, m))
          else scala.collection.immutable.TreeMap.from(
            t.quadCat(pairIdx(b, a, m)).iterator.map { case (key, v) =>
              catKey(catKey2(key), catKey1(key)) -> v // pair order flips ⇒ swap keys
            })
        k += 1
      }
      j += 1
    }
    Triple(
      t.n,
      numPerm.map(t.lin),
      quad,
      catPerm.map(t.linCat),
      Array.tabulate(n * m)(idx => t.quadNumCat(numPerm(idx / m) * m + catPerm(idx % m))),
      quadCat)
  }

  /** NB-reduced variant helpers: diagonal-only quad, counts-only cat
    * (lift_to_nb_agg.cpp:101-161). An NB aggregate reuses Triple with
    * quad.length == numCols and empty quadNumCat/quadCat. */
  def liftNb(num: Array[Double], cat: Array[Int]): Triple = {
    val quad = Array.tabulate(num.length)(i => num(i) * num(i))
    Triple(1L, num.clone(), quad,
      Array.tabulate(cat.length)(j => Map(cat(j) -> 1.0)),
      Array.empty, Array.empty)
  }

  /** NB ring product (mul_nb.cpp:20-268): no cross terms beyond scaling. */
  def multiplyNb(a: Triple, b: Triple): Triple = {
    val na = a.n.toDouble; val nb = b.n.toDouble
    def scale[K: Ordering](mp: Map[K, Double], s: Double): Map[K, Double] =
      if (s == 0.0) scala.collection.immutable.TreeMap.empty[K, Double]
      else scala.collection.immutable.TreeMap.from(
        mp.iterator.collect { case (k, v) if v * s != 0.0 => k -> v * s })
    Triple(
      a.n * b.n,
      (a.lin.map(_ * nb) ++ b.lin.map(_ * na)),
      (a.quad.map(_ * nb) ++ b.quad.map(_ * na)),
      (a.linCat.map(scale(_, nb)) ++ b.linCat.map(scale(_, na))),
      Array.empty, Array.empty
    )
  }
}
