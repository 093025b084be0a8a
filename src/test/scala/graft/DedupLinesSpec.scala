package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Dedup.dedupLines]]: the C4-style line-level corpus
  * filter. Line identity is exact bytes, removal is corpus-global at
  * `minCount`, documents rebuild in original line order, and the NULL /
  * fully-duplicated / blank-line contracts hold. */
class DedupLinesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minCount: Long = 2L) =
    Dedup.dedupLines(docs.toDF("id", "text"), "id", "text", minCount)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).sortBy(_._1)

  test("corpus-global duplicated lines are removed everywhere; order preserved") {
    val docs = Seq(
      1L -> "alpha\ncookie banner\nbravo",
      2L -> "cookie banner\ncharlie",
      3L -> "delta\necho")
    val got = run(docs)
    assert(got(0) == ((1L, "alpha\nbravo", 1, 3)))
    assert(got(1) == ((2L, "charlie", 1, 2)))
    assert(got(2) == ((3L, "delta\necho", 0, 2)))
  }

  test("blank lines are lines: duplicated blanks strip (the C4 rule)") {
    val docs = Seq(
      1L -> "a\n\nb",
      2L -> "c\n\nd")
    val got = run(docs)
    assert(got(0) == ((1L, "a\nb", 1, 3)))
    assert(got(1) == ((2L, "c\nd", 1, 3)))
  }

  test("line identity is exact bytes — no trim, case-sensitive") {
    val docs = Seq(
      1L -> "Same\nsame \nsame",
      2L -> "Same\nsame\nsame ")
    // "Same" dup; "same " dup; "same" dup — all three variants are
    // distinct lines, each duplicated across the two docs
    val got = run(docs)
    assert(got(0) == ((1L, "", 3, 3)))
    assert(got(1) == ((2L, "", 3, 3)))
  }

  test("minCount thresholds; single-line docs; NULL text") {
    val docs = Seq(
      1L -> "x\ny",
      2L -> "x\nz",
      3L -> "x\nw",
      4L -> null.asInstanceOf[String])
    val at2 = run(docs)
    assert(at2(0) == ((1L, "y", 1, 2)))
    assert(at2(3) == ((4L, null, -1, -1)))
    val at4 = run(docs, minCount = 4L)
    assert(at4(0) == ((1L, "x\ny", 0, 2)))
    require(at4(3)._2 == null)
  }

  test("a fully-duplicated document rebuilds to empty, row survives") {
    val docs = Seq(1L -> "only", 2L -> "only", 3L -> "only\nmore")
    val got = run(docs)
    assert(got(0) == ((1L, "", 1, 1)))
    assert(got(1) == ((2L, "", 1, 1)))
    assert(got(2) == ((3L, "more", 1, 2)))
  }

  test("keepFirst: C4's exact rule — one canonical occurrence survives") {
    val docs = Seq(
      1L -> "banner\nalpha",
      2L -> "bravo\nbanner",
      3L -> "banner\ncharlie")
    val got = Dedup.dedupLines(docs.toDF("id", "text"), "id", "text",
        minCount = 2L, keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    // the globally smallest (id, pos) = (1, 0) keeps its banner
    assert(got(0) == ((1L, "banner\nalpha", 0)))
    assert(got(1) == ((2L, "bravo", 1)))
    assert(got(2) == ((3L, "charlie", 1)))
    // layout independence of the canonical pick
    val b = Dedup.dedupLines(docs.toDF("id", "text").repartition(7), "id", "text",
        minCount = 2L, keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(got.toSeq == b.toSeq)
  }

  test("layout-independent and custom separator") {
    val docs = (0 until 200).map(i => (i.toLong, s"common|unique$i|${if (i % 2 == 0) "even" else "odd"}"))
    val df = docs.toDF("id", "text")
    val a = Dedup.dedupLines(df, "id", "text", 2L, "|")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Dedup.dedupLines(df.repartition(17, $"text"), "id", "text", 2L, "|")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    val five = a.find(_._1 == 5L).get._2
    // "common" (200×) strips; "odd"/"even" (100× each) strip; unique stays
    assert(five == "unique5")
  }

  test("hot-line guard: byte-identical output with a dominant boilerplate line") {
    // one synthetic hot key ("HOT FOOTER", 300×) plus light duplicates
    // ("pair", 2×) and unique lines — the guard must route the hot line
    // around the window and change NOTHING in the output
    val docs = (0 until 300).map(i =>
      (i.toLong, s"unique line $i\nHOT FOOTER\n${if (i < 2) "pair" else s"tail$i"}"))
    val df = docs.toDF("id", "text")
    def collectAll(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).sortBy(_._1).toSeq
    val unguarded = collectAll(Dedup.dedupLines(df, "id", "text"))
    val guarded = collectAll(Dedup.dedupLines(df, "id", "text", hotLineThreshold = 100L))
    assert(guarded == unguarded, "guarded output must be byte-identical")
    assert(unguarded.head._2 == "unique line 0\ntail0"
      || unguarded.head._2 == "unique line 0", "hot footer must be stripped")
    // keepFirst: the canonical pick must also survive the hot routing
    val ug2 = Dedup.dedupLines(df, "id", "text", keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val g2 = Dedup.dedupLines(df, "id", "text", keepFirst = true, hotLineThreshold = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(g2 == ug2, "keepFirst canonical pick must be identical under the guard")
    assert(g2.head._2.contains("HOT FOOTER"), "doc 0 holds the canonical occurrence")
    // threshold below every line's count routes EVERYTHING hot — still identical
    val g3 = collectAll(Dedup.dedupLines(df, "id", "text", hotLineThreshold = 1L))
    assert(g3 == unguarded, "all-hot routing must be identical too")
  }

  test("hot-line guard falls back loudly past the 4096-digest cap") {
    // 5000 distinct lines, each duplicated twice: at threshold 2 the hot
    // set exceeds the broadcast cap, so the guard must fall back to the
    // unguarded window and still produce the exact result
    val docs = (0 until 5000).flatMap(i => Seq(
      (2L * i, s"dup line $i"), (2L * i + 1, s"dup line $i")))
    val df = docs.toDF("id", "text")
    val got = Dedup.dedupLines(df, "id", "text", hotLineThreshold = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(got.length == 10000)
    assert(got.forall(_._2 == ""), "every line is duplicated — all docs rebuild empty")
    assert(got.forall(_._3 == 1))
  }
}
