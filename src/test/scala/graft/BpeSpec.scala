package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Bpe]]: the incremental-pair-count trainer must
  * equal a naive full-recount reference merge for merge, the pinned
  * pass semantics (left-to-right non-overlapping, UTF-8 tie-break)
  * must hold, and encoding must replay training's end state. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- naive driver reference: full recount per merge ----
  private def naiveMergePass(sym: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < sym.length) {
      if (j + 1 < sym.length && sym(j) == l && sym(j + 1) == r) { out += l + r; j += 2 }
      else { out += sym(j); j += 1 }
    }
    out.result()
  }
  private def naiveTrain(dict: Seq[(String, Long)], numMerges: Int)
      : (Seq[(String, String)], Seq[Long], Map[String, Vector[String]]) = {
    var words = dict.map { case (w, c) =>
      (w.toCharArray.map(_.toString).toVector, c)
    }
    val merges = Seq.newBuilder[(String, String)]
    val counts = Seq.newBuilder[Long]
    var k = 0
    var break = false
    while (k < numMerges && !break) {
      val pc = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (s, c) =>
        s.zip(s.drop(1)).foreach(p => pc.update(p, pc.getOrElse(p, 0L) + c))
      }
      if (pc.isEmpty) break = true
      else {
        val best = pc.toSeq.minBy { case ((l, r), c) =>
          (-c, l.getBytes("UTF-8").map(b => f"${b & 0xFF}%03d").mkString,
            r.getBytes("UTF-8").map(b => f"${b & 0xFF}%03d").mkString)
        }
        merges += best._1
        counts += best._2
        words = words.map { case (s, c) => (naiveMergePass(s, best._1._1, best._1._2), c) }
        k += 1
      }
    }
    (merges.result(), counts.result(),
      dict.map(_._1).zip(words.map(_._1)).toMap)
  }

  test("trainFromDict equals the naive full-recount reference (fuzz, ties, runs)") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { trial =>
      val alphabet = "abcd"
      val dict = (1 to 30).map { _ =>
        val w = (1 to (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        (w, (1 + rnd.nextInt(5)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq.sortBy(_._1)
      val nm = 1 + rnd.nextInt(12)
      val got = Bpe.trainFromDict(dict.toArray, nm)
      val (em, ec, _) = naiveTrain(dict, nm)
      assert(got.merges == em, s"trial $trial: merges ${got.merges} vs $em")
      assert(got.counts == ec, s"trial $trial: counts")
    }
  }

  test("run semantics: 'a a a a' merges to [aa, aa]; ties break by UTF-8 (left, right)") {
    val m = Bpe.trainFromDict(Array(("aaaa", 1L)), 1)
    assert(m.merges == Seq(("a", "a")) && m.counts == Seq(3L))
    val enc = Bpe.trainFromDict(Array(("aaaa", 1L)), 2)
    // after (a,a): [aa, aa] → second merge is (aa, aa)
    assert(enc.merges(1) == ("aa", "aa"))
    // tie between (a,b) and (b,a) at count 2 → (a,b) first
    val t = Bpe.trainFromDict(Array(("ab", 2L), ("ba", 2L)), 1)
    assert(t.merges == Seq(("a", "b")))
  }

  test("encode replays training end state on dict words; unseen words + ascending sweep") {
    val dict = Array(("lower", 3L), ("low", 5L), ("newest", 2L), ("newer", 4L))
    val model = Bpe.trainFromDict(dict, 6)
    val (_, _, endState) = naiveTrain(dict.toSeq, 6)
    val docs = Seq((1L, "low lower newest"), (2L, "newer low"),
      (3L, "unseen lowest"), (4L, null.asInstanceOf[String]), (5L, "  \t ")).toDF("id", "text")
    val enc = Bpe.encode(docs, "text", model)
      .select($"id", $"tokens").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(enc(1L) == endState("low") ++ endState("lower") ++ endState("newest"))
    assert(enc(2L) == endState("newer") ++ endState("low"))
    assert(enc(4L) == null) // NULL text → NULL tokens
    assert(enc(5L) == Seq.empty) // whitespace-only → zero tokens
    // unseen word: exact ascending-rank replay
    var sym = "unseen".toCharArray.map(_.toString).toVector
    model.merges.foreach { case (l, r) => sym = naiveMergePass(sym, l, r) }
    var sym2 = "lowest".toCharArray.map(_.toString).toVector
    model.merges.foreach { case (l, r) => sym2 = naiveMergePass(sym2, l, r) }
    assert(enc(3L) == sym ++ sym2)
    // round-trip property: concatenating a word's tokens rebuilds it
    assert(enc(3L).mkString == "unseenlowest")
  }

  test("interned encode kernel ≡ naive rank replay (fuzz: unknown symbols, deep merges)") {
    val rnd = new scala.util.Random(43)
    (1 to 8).foreach { trial =>
      val trainAlpha = "abc"
      val dict = (1 to 40).map { _ =>
        ((1 to (2 + rnd.nextInt(7))).map(_ => trainAlpha(rnd.nextInt(3))).mkString,
          (1 + rnd.nextInt(9)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray.sortBy(_._1)
      val model = Bpe.trainFromDict(dict, 3 + rnd.nextInt(20))
      // docs mix trained chars with UNSEEN ones (x/y/z never trained)
      val docAlpha = "abcxyz"
      val docs = (1 to 15).map { d =>
        (d.toLong, (1 to (1 + rnd.nextInt(6))).map(_ =>
          (1 to (1 + rnd.nextInt(9))).map(_ => docAlpha(rnd.nextInt(6))).mkString)
          .mkString(" "))
      }
      val got = Bpe.encode(docs.toDF("id", "text"), "text", model)
        .select($"id", $"tokens").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
      docs.foreach { case (id, text) =>
        val want = text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
          var sym = w.toCharArray.map(_.toString).toVector
          model.merges.foreach { case (l, r) => sym = naiveMergePass(sym, l, r) }
          sym
        }
        assert(got(id) == want, s"trial $trial doc $id: ${got(id)} vs $want")
      }
    }
  }

  test("distributed word counts feed the same model as a driver count; minCount prunes") {
    val docs = Seq("low low lower", "low\tnewest\nnewer", "newer newer").toDF("text")
    val m1 = Bpe.train(docs, "text", 4)
    val driverDict = Seq(("low", 3L), ("lower", 1L), ("newest", 1L), ("newer", 3L))
    val m2 = Bpe.trainFromDict(driverDict.toArray, 4)
    assert(m1.merges == m2.merges && m1.counts == m2.counts)
    // minCount drops the singletons
    val m3 = Bpe.train(docs, "text", 4, minCount = 2L)
    val m4 = Bpe.trainFromDict(Array(("low", 3L), ("newer", 3L)), 4)
    assert(m3.merges == m4.merges)
    // dict over maxWords fails loudly
    intercept[IllegalArgumentException] { Bpe.train(docs, "text", 2, maxWords = 2) }
    // merge exhaustion stops early instead of looping
    val tiny = Bpe.trainFromDict(Array(("ab", 1L)), 10)
    assert(tiny.merges == Seq(("a", "b"))) // then no pairs remain
  }

  test("token ids: alphabet order, product ranks, repeated-product first-wins, UNK=-1") {
    // alphabet {a,b,c} → ids 0,1,2; products: rank1 (a,b)→"ab" id 3,
    // rank2 (ab,c)→"abc" id 4, rank3 (a,bc)→"abc" REPEATED → 4 owns it
    val model = Bpe.BpeModel(
      IndexedSeq(("a", "b"), ("ab", "c"), ("a", "bc")),
      IndexedSeq(9L, 5L, 1L), IndexedSeq("a", "b", "c"))
    val docs = Seq((1L, "abc c b"), (2L, "xyz a"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Bpe.encodeIds(docs, "text", model)
      .select($"id", $"token_ids").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(got(1L) == Seq(4, 2, 1)) // "abc"→4 (first id wins), "c"→2, "b"→1
    assert(got(2L) == Seq(-1, -1, -1, 0)) // x,y,z unseen → UNK; "a"→0
    assert(got(3L) == null)
    // trained-model ids: every dict-word token is in-vocab (no -1)
    val trained = Bpe.trainFromDict(Array(("lower", 3L), ("low", 5L)), 4)
    assert(trained.alphabet == Seq("e", "l", "o", "r", "w"))
    val enc = Bpe.encodeIds(Seq("low lower").toDF("text"), "text", trained)
      .select($"token_ids").head.getSeq[Int](0)
    assert(enc.forall(_ >= 0))
  }

  test("save/load round-trips the model; encode stays codegen'd") {
    val model = Bpe.trainFromDict(Array(("lower", 3L), ("lowest", 2L)), 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Bpe.save(model, spark, s"$dir/m")
    val back = Bpe.load(spark, s"$dir/m")
    assert(back.merges == model.merges && back.counts == model.counts)
    assert(back.alphabet == model.alphabet)
    val docs = Seq("lower lowest low").toDF("text")
    val plan = Bpe.encode(docs, "text", back)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("Fallback"),
      s"encode must not fall out of codegen:\n$plan")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(dir))
  }

  test("encode is a STRICT single ascending replay: a pair re-created by a later merge is not re-merged") {
    // Hand-built table (no trainer emits it; the persisted-model path
    // accepts arbitrary tables): rank 0 = (a, bb), rank 1 = (b, b).
    // On "abb": rank 0 finds no "bb" symbol yet; rank 1 makes [a, bb].
    // The PAIR (a, bb) now exists with rank 0 — but rank 0 was already
    // replayed, so the contracted ascending semantics (trainer, q105/
    // q106 oracle, naive reference) must emit [a, bb], never "abb".
    val model = Bpe.BpeModel(
      IndexedSeq(("a", "bb"), ("b", "b")), IndexedSeq(1L, 1L), IndexedSeq("a", "b"))
    val got = Bpe.encode(Seq((1L, "abb")).toDF("id", "text"), "text", model)
      .select($"tokens").collect().head.getSeq[String](0)
    // the naive reference replay agrees
    var sym = Vector("a", "b", "b")
    model.merges.foreach { case (l, r) => sym = naiveMergePass(sym, l, r) }
    assert(sym == Vector("a", "bb"))
    assert(got == Seq("a", "bb"), s"encode diverged from ascending replay: $got")
    // and the ids path rides the same kernel
    val ids = Bpe.encodeIds(Seq((1L, "abb")).toDF("id", "text"), "text", model)
      .select($"token_ids").collect().head.getSeq[Int](0)
    assert(ids == Seq(0, 3)) // a=0, b=1, "abb"=2 (rank0 product), "bb"=3
  }

  test("repeated encodes of one model reuse one broadcast (no per-call leak)") {
    val model = Bpe.trainFromDict(Array(("low", 5L), ("lower", 3L)), 4)
    val docs = Seq((1L, "low lower")).toDF("id", "text")
    def bcIdOf(df: org.apache.spark.sql.DataFrame): Long = {
      val expr = df.queryExecution.analyzed.expressions
        .flatMap(_.collect { case e: graft.functions.BpeEncode => e }).head
      expr.bc.id
    }
    val id1 = bcIdOf(Bpe.encode(docs, "text", model))
    val id2 = bcIdOf(Bpe.encode(docs, "text", model))
    val id3 = bcIdOf(Bpe.encodeIds(docs, "text", model))
    assert(id1 == id2, "second encode of the same model shipped a new broadcast")
    assert(id1 == id3, "encodeIds did not share the cached merge broadcast")
  }
}
