package graft

import graft.ring.Triple
import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from the reference's pytest suite
  * (duckdb_extension/test/python/test_sum.py, test_mul.py — fixture F1 in
  * FIXTURES.md) plus ring-law property tests on seeded random
  * integer-valued tables. Integer values are exact in float32 and float64,
  * so equality is exact. */
class RingSpec extends AnyFunSuite {

  // F1: test(gb, a, b, c, d, e, f) — test_sum.py:15-16
  val rows: Seq[(Int, Array[Double], Array[Int])] = Seq(
    (1, Array(1.0, 2.0, 3.0), Array(4, 5, 6)),
    (1, Array(5.0, 6.0, 7.0), Array(8, 9, 10)),
    (2, Array(2.0, 1.0, 3.0), Array(4, 6, 8)),
    (2, Array(5.0, 7.0, 6.0), Array(8, 10, 12)),
    (2, Array(2.0, 1.0, 3.0), Array(4, 6, 8))
  )

  def tripleOf(rs: Seq[(Array[Double], Array[Int])]): Triple =
    rs.map { case (n, c) => Triple.lift(n, c) }.reduce(Triple.add)

  def k(c1: Int, c2: Int): Long = Triple.catKey(c1, c2)

  test("sum_to_triple_3_3 over whole table matches reference golden (test_sum.py:25)") {
    val t = tripleOf(rows.map(r => (r._2, r._3)))
    assert(t.n == 5L)
    assert(t.lin.toSeq == Seq(15.0, 17.0, 22.0))
    assert(t.quad.toSeq == Seq(59.0, 71.0, 80.0, 91.0, 96.0, 112.0))
    assert(t.linCat.toSeq == Seq(
      Map(4 -> 3.0, 8 -> 2.0),
      Map(5 -> 1.0, 6 -> 2.0, 9 -> 1.0, 10 -> 1.0),
      Map(6 -> 1.0, 8 -> 2.0, 10 -> 1.0, 12 -> 1.0)))
    assert(t.quadNumCat.toSeq == Seq(
      Map(4 -> 5.0, 8 -> 10.0),
      Map(5 -> 1.0, 6 -> 4.0, 9 -> 5.0, 10 -> 5.0),
      Map(6 -> 1.0, 8 -> 4.0, 10 -> 5.0, 12 -> 5.0),
      Map(4 -> 4.0, 8 -> 13.0),
      Map(5 -> 2.0, 6 -> 2.0, 9 -> 6.0, 10 -> 7.0),
      Map(6 -> 2.0, 8 -> 2.0, 10 -> 6.0, 12 -> 7.0),
      Map(4 -> 9.0, 8 -> 13.0),
      Map(5 -> 3.0, 6 -> 6.0, 9 -> 7.0, 10 -> 6.0),
      Map(6 -> 3.0, 8 -> 6.0, 10 -> 7.0, 12 -> 6.0)))
    assert(t.quadCat.toSeq == Seq(
      Map(k(4, 4) -> 3.0, k(8, 8) -> 2.0),
      Map(k(4, 5) -> 1.0, k(4, 6) -> 2.0, k(8, 9) -> 1.0, k(8, 10) -> 1.0),
      Map(k(4, 6) -> 1.0, k(4, 8) -> 2.0, k(8, 10) -> 1.0, k(8, 12) -> 1.0),
      Map(k(5, 5) -> 1.0, k(6, 6) -> 2.0, k(9, 9) -> 1.0, k(10, 10) -> 1.0),
      Map(k(5, 6) -> 1.0, k(6, 8) -> 2.0, k(9, 10) -> 1.0, k(10, 12) -> 1.0),
      Map(k(6, 6) -> 1.0, k(8, 8) -> 2.0, k(10, 10) -> 1.0, k(12, 12) -> 1.0)))
  }

  test("group-by goldens (test_sum.py:29-38)") {
    val g1 = tripleOf(rows.filter(_._1 == 1).map(r => (r._2, r._3)))
    val g2 = tripleOf(rows.filter(_._1 == 2).map(r => (r._2, r._3)))
    assert(g1.n == 2 && g1.lin.toSeq == Seq(6.0, 8.0, 10.0))
    assert(g1.quad.toSeq == Seq(26.0, 32.0, 38.0, 40.0, 48.0, 58.0))
    assert(g2.n == 3 && g2.lin.toSeq == Seq(9.0, 9.0, 12.0))
    assert(g2.quad.toSeq == Seq(33.0, 39.0, 42.0, 51.0, 48.0, 54.0))
    assert(g2.linCat.toSeq == Seq(
      Map(4 -> 2.0, 8 -> 1.0), Map(6 -> 2.0, 10 -> 1.0), Map(8 -> 2.0, 12 -> 1.0)))
    // add over groups == whole table
    assert(Triple.add(g1, g2) == tripleOf(rows.map(r => (r._2, r._3))))
    // subtract is the inverse (delta-maintenance identity, sub.cpp:71-217)
    assert(Triple.subtract(Triple.add(g1, g2), g2) == g1)
  }

  test("multiply_triple matches reference golden (test_mul.py:24-27)") {
    // A = sum_to_triple_2_2(b,c,d,e) where gb=1 ; B = sum_to_triple_2_2(a,c,d,f) where gb=2
    val a = tripleOf(rows.filter(_._1 == 1).map(r => (Array(r._2(1), r._2(2)), Array(r._3(0), r._3(1)))))
    val b = tripleOf(rows.filter(_._1 == 2).map(r => (Array(r._2(0), r._2(2)), Array(r._3(0), r._3(2)))))
    val m = Triple.multiply(a, b)
    assert(m.n == 6L)
    assert(m.lin.toSeq == Seq(24.0, 30.0, 18.0, 24.0))
    assert(m.quad.toSeq == Seq(120.0, 144.0, 72.0, 96.0, 174.0, 90.0, 120.0, 66.0, 84.0, 108.0))
    assert(m.linCat.toSeq == Seq(
      Map(4 -> 3.0, 8 -> 3.0), Map(5 -> 3.0, 9 -> 3.0),
      Map(4 -> 4.0, 8 -> 2.0), Map(8 -> 4.0, 12 -> 2.0)))
    assert(m.quadNumCat.toSeq == Seq(
      Map(4 -> 6.0, 8 -> 18.0), Map(5 -> 6.0, 9 -> 18.0),
      Map(4 -> 16.0, 8 -> 8.0), Map(8 -> 16.0, 12 -> 8.0),
      Map(4 -> 9.0, 8 -> 21.0), Map(5 -> 9.0, 9 -> 21.0),
      Map(4 -> 20.0, 8 -> 10.0), Map(8 -> 20.0, 12 -> 10.0),
      Map(4 -> 9.0, 8 -> 9.0), Map(5 -> 9.0, 9 -> 9.0),
      Map(4 -> 8.0, 8 -> 10.0), Map(8 -> 8.0, 12 -> 10.0),
      Map(4 -> 12.0, 8 -> 12.0), Map(5 -> 12.0, 9 -> 12.0),
      Map(4 -> 12.0, 8 -> 12.0), Map(8 -> 12.0, 12 -> 12.0)))
    assert(m.quadCat.toSeq == Seq(
      Map(k(4, 4) -> 3.0, k(8, 8) -> 3.0),
      Map(k(4, 5) -> 3.0, k(8, 9) -> 3.0),
      Map(k(4, 4) -> 2.0, k(4, 8) -> 1.0, k(8, 4) -> 2.0, k(8, 8) -> 1.0),
      Map(k(4, 8) -> 2.0, k(4, 12) -> 1.0, k(8, 8) -> 2.0, k(8, 12) -> 1.0),
      Map(k(5, 5) -> 3.0, k(9, 9) -> 3.0),
      Map(k(5, 4) -> 2.0, k(5, 8) -> 1.0, k(9, 4) -> 2.0, k(9, 8) -> 1.0),
      Map(k(5, 8) -> 2.0, k(5, 12) -> 1.0, k(9, 8) -> 2.0, k(9, 12) -> 1.0),
      Map(k(4, 4) -> 4.0, k(8, 8) -> 2.0),
      Map(k(4, 8) -> 4.0, k(8, 12) -> 2.0),
      Map(k(8, 8) -> 4.0, k(12, 12) -> 2.0)))
  }

  // --- property tests on seeded random integer-valued tables (exact arithmetic) ---

  def randRows(rng: scala.util.Random, numCols: Int, catCols: Int): List[(Array[Double], Array[Int])] =
    List.fill(1 + rng.nextInt(8))(
      (Array.fill(numCols)(rng.nextInt(19).toDouble - 9), Array.fill(catCols)(rng.nextInt(5))))

  test("multiply(triple(A), triple(B)) == triple(A × B) (factorized-join identity, README.md:163-173)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 60) {
      val ra = randRows(rng, 1 + rng.nextInt(3), rng.nextInt(3))
      val rb = randRows(rng, 1 + rng.nextInt(3), rng.nextInt(3))
      val crossed = for { (na, ca) <- ra; (nb, cb) <- rb } yield (na ++ nb, ca ++ cb)
      assert(Triple.multiply(tripleOf(ra), tripleOf(rb)) == tripleOf(crossed))
    }
  }

  test("add is commutative; subtract inverts add") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 60) {
      val (ra, rb) = (randRows(rng, 2, 2), randRows(rng, 2, 2))
      val (ta, tb) = (tripleOf(ra), tripleOf(rb))
      assert(Triple.add(ta, tb) == Triple.add(tb, ta))
      assert(Triple.subtract(Triple.add(ta, tb), tb) == ta)
    }
  }

  test("multiply distributes over add (disjoint union of right row sets)") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 60) {
      val (ra, rb, rc) = (randRows(rng, 2, 1), randRows(rng, 1, 2), randRows(rng, 1, 2))
      val (ta, tb, tc) = (tripleOf(ra), tripleOf(rb), tripleOf(rc))
      assert(Triple.multiply(ta, Triple.add(tb, tc)) ==
        Triple.add(Triple.multiply(ta, tb), Triple.multiply(ta, tc)))
    }
  }

  test("permute: triple of reordered columns == permuted triple") {
    val rng = new scala.util.Random(17)
    for (_ <- 1 to 40) {
      val rs = randRows(rng, 3, 3)
      val numPerm = rng.shuffle(List(0, 1, 2)).toArray
      val catPerm = rng.shuffle(List(0, 1, 2)).toArray
      val direct = tripleOf(rs.map { case (n, c) =>
        (numPerm.map(n), catPerm.map(c))
      })
      assert(Triple.permute(tripleOf(rs), numPerm, catPerm) == direct)
    }
  }

  test("NB lift/multiply: diagonal-only quad, counts-only cat (lift_to_nb_agg.cpp)") {
    val t = rows.map(r => Triple.liftNb(r._2, r._3)).reduce(Triple.add)
    assert(t.n == 5 && t.lin.toSeq == Seq(15.0, 17.0, 22.0))
    assert(t.quad.toSeq == Seq(59.0, 91.0, 112.0)) // Σa², Σb², Σc²
    assert(t.quadNumCat.isEmpty && t.quadCat.isEmpty)
    val m = Triple.multiplyNb(t, t)
    assert(m.n == 25 && m.lin.toSeq == Seq(75.0, 85.0, 110.0, 75.0, 85.0, 110.0))
  }

  test("degenerate shapes: no categorical / no numerical columns (test_lift.py:33-49)") {
    val numOnly = tripleOf(Seq((Array(1.0, 2.0), Array.empty[Int]), (Array(3.0, 4.0), Array.empty[Int])))
    assert(numOnly.n == 2 && numOnly.lin.toSeq == Seq(4.0, 6.0) && numOnly.catCols == 0)
    assert(numOnly.quad.toSeq == Seq(10.0, 14.0, 20.0))
    val catOnly = tripleOf(Seq((Array.empty[Double], Array(1, 2)), (Array.empty[Double], Array(1, 3))))
    assert(catOnly.n == 2 && catOnly.numCols == 0)
    assert(catOnly.linCat.toSeq == Seq(Map(1 -> 2.0), Map(2 -> 1.0, 3 -> 1.0)))
    assert(catOnly.quadCat.toSeq == Seq(
      Map(k(1, 1) -> 2.0), Map(k(1, 2) -> 1.0, k(1, 3) -> 1.0), Map(k(2, 2) -> 1.0, k(3, 3) -> 1.0)))
    // cross-shape multiply
    val m = Triple.multiply(numOnly, catOnly)
    assert(m.n == 4 && m.numCols == 2 && m.catCols == 2)
    assert(m.lin.toSeq == Seq(8.0, 12.0))
  }
}
