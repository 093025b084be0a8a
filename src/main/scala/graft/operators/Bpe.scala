package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
 * ACL 2016) — the tokenize step of the tokenize → pack training-data
 * flow ([[Pack]] owns the packing end). Training is the classic
 * two-level shape every large-corpus BPE trainer uses:
 *
 *   1. DISTRIBUTED word counting — one `groupBy(word).count()` over
 *      the whitespace-split corpus (the only shuffle; map-side partial
 *      aggregation means each task ships its distinct words, not its
 *      token stream). 100 TB of text has a bounded distinct-word set;
 *      `minCount` prunes the hapax tail BEFORE collection and the
 *      `maxWords` cap fails loudly rather than silently truncating the
 *      dict (a truncated dict trains a DIFFERENT tokenizer — raise
 *      `minCount` instead, which is the standard and stated knob).
 *   2. EXACT driver merge loop over the (word, count) dict — the dict
 *      is 5–6 orders of magnitude smaller than the corpus, and the
 *      merge recurrence is inherently sequential (merge k+1's counts
 *      depend on merge k), so the driver loop is the right placement,
 *      not a per-merge distributed recount (numMerges shuffles of the
 *      corpus). Pair counts update incrementally: only words containing
 *      the merged pair are touched, via a pair → word-ids index.
 *
 * Within a merge pass, occurrences merge LEFT-TO-RIGHT NON-OVERLAPPING
 * (`a a a a` under merge `(a,a)` → `aa aa`, `a a a` → `aa a`), and the
 * best pair breaks count ties by (left, right) ascending in UTF-8 BYTE
 * order — both pinned because the q105/q106 oracles replay training
 * and encoding in DuckDB (binary collation, left-to-right `replace`)
 * and must match bit-for-bit.
 *
 * Encoding ([[graft.functions.BpeEncode]]) replays the merge list in
 * rank order per word. A pair produced by merge k can only be consumed
 * by a LATER-ranked merge (its symbol did not exist before rank k when
 * the table was trained), so one ascending-rank sweep is exact — and
 * identical to the training end-state for any word the dict contained.
 */
object Bpe {

  /** A trained tokenizer: `merges(k)` is the rank-(k+1) merge; `counts`
    * is the pair's dict-weighted count at selection time (audit +
    * oracle surface); `alphabet` is the training dict's distinct code
    * points in UTF-8 byte order — the base of the token-ID vocabulary.
    *
    * Token IDs ([[encodeIds]]): alphabet symbols take ids
    * `0 .. |A|−1` in that sorted order, merge products take
    * `|A| + rank` in merge order; when two merges produce the SAME
    * string (e.g. `(a, bc)` and `(ab, c)` both → `abc`) the FIRST
    * (lowest) id owns the string. Symbols outside the vocabulary
    * (code points never seen in training) emit `-1` (UNK). The whole
    * numbering is derivable from the model alone — the q111 oracle
    * rebuilds it in SQL. */
  final case class BpeModel(merges: IndexedSeq[(String, String)],
                            counts: IndexedSeq[Long],
                            alphabet: IndexedSeq[String]) {
    require(merges.length == counts.length)
    // the broadcast cache probes this per encode() CALL — structural
    // hashing of a 30k-merge table every call adds up (round-18
    // advice). Hash once; equals stays structural (and only runs on a
    // hash collision).
    override lazy val hashCode: Int = scala.util.hashing.MurmurHash3.productHash(this)
  }

  /** UTF-8 byte order (unsigned) — DuckDB's binary string collation,
    * the tie-break order the oracle sorts by. Differs from Java's
    * UTF-16 `compareTo` only above the BMP; pinned here so non-ASCII
    * corpora tie-break identically on both engines. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Whitespace-split word counts — the distributed half of training.
    * The split class is the pinned Java `\s` = [\t\n\x0B\f\r ] every
    * text kernel in this library uses. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** One left-to-right non-overlapping merge pass over a symbol array. */
  private def mergePass(sym: Array[String], l: String, r: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](sym.length)
    var j = 0
    while (j < sym.length) {
      if (j + 1 < sym.length && sym(j) == l && sym(j + 1) == r) {
        out += l + r; j += 2
      } else { out += sym(j); j += 1 }
    }
    out.toArray
  }

  /** Train `numMerges` merges. `minCount` drops rare words before the
    * dict collects (the scale knob); a dict larger than `maxWords`
    * fails loudly. Words shorter than 2 code points never merge and
    * are skipped. Symbols start as Unicode code points. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 1L, maxWords: Int = 4_000_000): BpeModel = {
    require(numMerges >= 1, s"train needs numMerges ≥ 1, got $numMerges")
    val wc = wordCounts(docs, textCol).filter(col("cnt") >= minCount)
    val dict = wc.collect().map(r => (r.getString(0), r.getLong(1)))
    require(dict.length <= maxWords,
      s"BPE dict has ${dict.length} words > maxWords=$maxWords — raise minCount " +
        "(silently truncating the dict would train a different tokenizer)")
    trainFromDict(dict, numMerges)
  }

  /** The exact merge loop, exposed for callers that already hold a
    * word-count dict (tests, re-training on a persisted dict). */
  def trainFromDict(dict: Array[(String, Long)], numMerges: Int): BpeModel = {
    // symbols per word (code points), dict-weighted pair counts, and a
    // pair → word-ids index so each merge touches only affected words
    val words = dict.map { case (w, _) =>
      val cps = new mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        cps += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      cps.toArray
    }
    val cnts = dict.map(_._2)
    val pairCount = new mutable.HashMap[(String, String), Long]
    val pairWords = new mutable.HashMap[(String, String), mutable.BitSet]
    def addWord(id: Int): Unit = {
      val s = words(id); val c = cnts(id)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
        pairWords.getOrElseUpdate(p, new mutable.BitSet) += id
        j += 1
      }
    }
    def dropWord(id: Int): Unit = {
      val s = words(id); val c = cnts(id)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val left = pairCount(p) - c
        if (left == 0L) { pairCount.remove(p); pairWords.remove(p) }
        else pairCount.update(p, left)
        j += 1
      }
    }
    words.indices.foreach(addWord)
    // the base vocabulary: distinct code points, UTF-8 byte order
    val alphabet = words.iterator.flatten.toSet.toIndexedSeq
      .sortWith(utf8Compare(_, _) < 0)

    val merges = IndexedSeq.newBuilder[(String, String)]
    val mergeCounts = IndexedSeq.newBuilder[Long]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      if (pairCount.isEmpty) exhausted = true
      else {
        // max count, ties by (left, right) ascending in UTF-8 byte order
        var best: (String, String) = null
        var bestC = -1L
        pairCount.foreach { case (p, c) =>
          if (c > bestC || (c == bestC &&
              (utf8Compare(p._1, best._1) < 0 ||
               (p._1 == best._1 && utf8Compare(p._2, best._2) < 0)))) {
            best = p; bestC = c
          }
        }
        merges += best
        mergeCounts += bestC
        // BitSet mutates as dropWord/addWord run — snapshot first
        val affected = pairWords(best).toArray
        affected.foreach { id =>
          dropWord(id)
          words(id) = mergePass(words(id), best._1, best._2)
          addWord(id)
        }
        k += 1
      }
    }
    BpeModel(merges.result(), mergeCounts.result(), alphabet)
  }

  // One broadcast per MODEL per context, not per encode call: a
  // long-lived session that encodes the same model repeatedly was
  // shipping (and leaking) a fresh broadcast every call (round-17
  // advice). Weak keys let a dropped model release its entry; the
  // context rides a WeakReference so a cache entry can never pin a
  // STOPPED SparkContext's object graph through a still-live model
  // (the value tuple held it strongly before); a restarted context
  // rebuilds. The alphabet table ships LAZILY — only encodeIds reads
  // it, and a merges-only encode() of a production vocab should not
  // distribute a 30k-string array it never touches. Structural
  // equality on BpeModel means equal models share one shipped table.
  private final class ModelBc(sc: org.apache.spark.SparkContext,
                              val merges: Broadcast[Array[(String, String)]]) {
    private val scRef = new java.lang.ref.WeakReference(sc)
    @volatile private var alphaBc: Broadcast[Array[String]] = _
    def liveFor(other: org.apache.spark.SparkContext): Boolean = {
      val got = scRef.get()
      (got eq other) && got != null && !got.isStopped
    }
    def alphabet(model: BpeModel): Broadcast[Array[String]] = synchronized {
      if (alphaBc == null) {
        val sc = scRef.get()
        require(sc != null && !sc.isStopped,
          "BPE model broadcast cache outlived its SparkContext — re-encode on the live session")
        alphaBc = sc.broadcast(model.alphabet.toArray)
      }
      alphaBc
    }
    /** Release this entry's broadcasts on the driver AND executors when
      * their context is still alive (a stopped context already tore its
      * blocks down). Idempotent — an entry can surface both through the
      * replacement path and the phantom queue. */
    def destroyIfLive(): Unit = synchronized {
      if (!destroyed) {
        destroyed = true
        val got = scRef.get()
        if (got != null && !got.isStopped) {
          try merges.destroy() catch { case _: Exception => () }
          if (alphaBc != null) try alphaBc.destroy() catch { case _: Exception => () }
        }
      }
    }
    @volatile private var destroyed = false
  }
  private val bcCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[BpeModel, ModelBc]())
  // Round-18 advice asked for eager destroy() of broadcasts whose model
  // was GC'd — DELIBERATELY NOT DONE for GC'd-while-context-lives
  // entries: a lazy `encode()` plan captures only the BROADCAST handle
  // (BpeEncode ships the Broadcast, never the model), so the model can
  // be unreachable while plans that read broadcast.value are still
  // pending — an eager destroy would fail those plans with "Attempted
  // to use Broadcast after it was destroyed" (worse with structural
  // sharing: two equal models share one entry). Spark's ContextCleaner
  // already reclaims a broadcast once the Broadcast OBJECT itself —
  // including every plan holding it — becomes unreachable, which is
  // the correct lifetime here. The one eager path kept is replacement
  // below, where the superseded entry's context is stopped/changed and
  // no live plan of the CURRENT context can hold its broadcasts.
  private def modelBroadcasts(spark: SparkSession, model: BpeModel): ModelBc =
    bcCache.synchronized {
      val sc = spark.sparkContext
      val got = bcCache.get(model)
      if (got != null && got.liveFor(sc)) got
      else {
        // replacement (stopped/changed context): the superseded entry's
        // broadcasts are unreachable from the cache from here on —
        // release them now rather than waiting for GC (a no-op when the
        // old context is stopped, which already tore its blocks down)
        if (got != null) got.destroyIfLive()
        val fresh = new ModelBc(sc, sc.broadcast(model.merges.toArray))
        bcCache.put(model, fresh)
        fresh
      }
    }

  /** Encode `textCol` with a trained model: whitespace-split words,
    * each replayed through the merge list in rank order, token arrays
    * concatenated in word order. One broadcast, one scan, no shuffle —
    * see [[graft.functions.BpeEncode]]. */
  def encode(docs: DataFrame, textCol: String, model: BpeModel,
             out: String = "tokens"): DataFrame =
    docs.withColumn(out, encodeCol(col(textCol), modelBroadcasts(docs.sparkSession, model).merges))

  /** The encode Column for a caller-managed broadcast (lets several
    * queries share one shipped model). */
  def encodeCol(text: Column, bc: Broadcast[Array[(String, String)]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), bc))

  /** Encode to token IDS (ARRAY<INT>) — what a training pipeline packs
    * and serves. The numbering is the model-intrinsic one documented
    * on [[BpeModel]]: alphabet first (UTF-8 order), products by rank,
    * first id owns a repeated product string, out-of-vocabulary
    * symbols emit −1 (UNK). Same interned one-scan kernel. */
  def encodeIds(docs: DataFrame, textCol: String, model: BpeModel,
                out: String = "token_ids"): DataFrame = {
    val mb = modelBroadcasts(docs.sparkSession, model)
    docs.withColumn(out,
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.BpeEncode(
          org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol)),
          mb.merges, vocabBc = Some(mb.alphabet(model)))))
  }

  /** Persist a model as a one-file parquet artifact: merge rows
    * (kind 'merge': rank, left, right, cnt) + alphabet rows (kind
    * 'alpha': rank = vocab position, left = the symbol) — train once
    * on the reference corpus, encode every ingest. */
  def save(model: BpeModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val m = model.merges.zipWithIndex.map { case ((l, r), i) =>
      ("merge", i + 1, l, r, model.counts(i))
    }
    val a = model.alphabet.zipWithIndex.map { case (s, i) =>
      ("alpha", i, s, null.asInstanceOf[String], 0L)
    }
    (m ++ a).toDF("kind", "rank", "left", "right", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: SparkSession, path: String): BpeModel = {
    val all = spark.read.parquet(path)
      .select(col("kind"), col("rank"), col("left"), col("right"), col("cnt"))
      .collect()
    val m = all.filter(_.getString(0) == "merge").sortBy(_.getInt(1))
    val a = all.filter(_.getString(0) == "alpha").sortBy(_.getInt(1))
    BpeModel(m.map(r => (r.getString(2), r.getString(3))).toIndexedSeq,
      m.map(_.getLong(4)).toIndexedSeq,
      a.map(_.getString(2)).toIndexedSeq)
  }
}
