package graft.operators

import graft.functions.{AllNgrams, LmModel, LmScore}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Corpus-trained bigram language-model quality scoring — the CCNet
 * recipe (Wenzek et al., "CCNet: Extracting High Quality Monolingual
 * Datasets from Web Crawl Data", LREC 2020) with the n-gram model the
 * offline environment permits in place of its pretrained KenLM: train
 * token-bigram statistics on a REFERENCE corpus (the high-quality
 * slice), then score every candidate document by its negative mean
 * bigram log-likelihood. Low score = fluent under the reference
 * distribution; junk, boilerplate soup, and wrong-language text score
 * high — rank or threshold on it.
 *
 * Spark-first, 100 TB shape:
 *  - TRAIN: two counting aggregates over the reference corpus — the
 *    unigram side rides [[TextRank.termCounts]]'s per-partition
 *    vocabulary map (vocab-bounded), the bigram side explodes
 *    [[graft.functions.AllNgrams]] into the spill-safe hash aggregate
 *    (the n-gram space grows with the corpus, so a per-partition map
 *    would be an unbounded executor-memory bet — the same reasoning as
 *    duplicated-n-gram mining, `TextRank.duplicatedNgrams`). `minCount`
 *    prunes the bigram tail BEFORE the driver sees it; a model larger
 *    than `maxModel` fails LOUDLY (raise `minCount` — a pruned bigram
 *    backs off to the smoothed floor, which is the model's own
 *    semantics, so pruning degrades gracefully and deterministically).
 *  - SCORE: zero shuffles — the model ships as ONE TorrentBroadcast,
 *    each document pays one byte walk against two executor-cached
 *    probe tables ([[graft.functions.LmScore]]).
 *
 * Reference scope note: the reference engine has no text pipeline —
 * this operator is part of the library's LLM-curation extension.
 */
object LmQuality {

  /** A trained model handle: the broadcast plus its smoothing alpha.
    * `release()` drops the executor copies when the scoring pass is
    * done (the per-Lloyd-round discipline of the PQ trainers). */
  final case class BigramLm(bc: Broadcast[LmModel], alpha: Double) {
    def vocab: Long = bc.value.vocab
    def bigrams: Int = bc.value.bigramKeys.length
    def release(): Unit = bc.unpersist(blocking = false)
  }

  /** Train add-α bigram statistics on `docs(textCol)`. V = the FULL
    * distinct-unigram count (pruning applies to the bigram table only —
    * the smoothing denominator must not move when `minCount` does). */
  def train(docs: DataFrame, textCol: String, minCount: Long = 1L,
            maxModel: Int = 1 << 22, alpha: Double = 1.0): BigramLm = {
    require(minCount >= 1, s"train: minCount must be >= 1, got $minCount")
    require(maxModel > 0, s"train: maxModel must be positive, got $maxModel")
    require(alpha > 0, s"train: alpha must be positive, got $alpha")
    val uniRows = TextRank.termCounts(docs, textCol).take(maxModel + 1)
    if (uniRows.length > maxModel)
      throw new IllegalStateException(
        s"LmQuality.train: more than $maxModel distinct unigrams — the vocabulary no " +
        "longer fits a broadcast model; pre-filter the reference corpus")
    if (uniRows.isEmpty)
      throw new IllegalStateException("LmQuality.train: empty reference corpus")
    val bigram = ColumnBridge.column(AllNgrams(ColumnBridge.expression(col(textCol)), 2))
    val bigRows = docs.select(explode(bigram).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .take(maxModel + 1)
    if (bigRows.length > maxModel)
      throw new IllegalStateException(
        s"LmQuality.train: more than $maxModel bigrams at minCount=$minCount — " +
        "raise minCount (pruned bigrams back off to the smoothed floor)")
    def utf8(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val model = new LmModel(
      bigRows.map(r => utf8(r.getString(0))), bigRows.map(_.getLong(1)),
      uniRows.map(r => utf8(r.getString(0))), uniRows.map(_.getLong(1)),
      vocab = uniRows.length.toLong)
    BigramLm(docs.sparkSession.sparkContext.broadcast(model), alpha)
  }

  /** The scoring Column: negative mean bigram log-likelihood of `text`
    * under `lm` (NULL for NULL text and for documents with < 2
    * tokens — no bigram evidence is not evidence of quality). */
  def score(lm: BigramLm, text: Column): Column =
    ColumnBridge.column(LmScore(ColumnBridge.expression(text), lm.bc, lm.alpha))

  /** Self-scored corpus quality in one call: train on `docs`, append
    * `lm_score` (the training corpus IS the reference — the in-corpus
    * outlier survey). The model handle is returned for release. */
  def scoreCorpus(docs: DataFrame, textCol: String, minCount: Long = 1L,
                  maxModel: Int = 1 << 22, alpha: Double = 1.0): (DataFrame, BigramLm) = {
    val lm = train(docs, textCol, minCount, maxModel, alpha)
    (docs.withColumn("lm_score", score(lm, col(textCol))), lm)
  }

  /** Persist a trained model as parquet — train once on the reference
    * corpus, score every future ingest job from the artifact (the
    * deployment shape; retraining per job re-reads the whole reference).
    * Layout: one row per gram, `(kind 'b'|'u', gram STRING, n LONG)`,
    * plus one `kind = 'm'` metadata row carrying (vocab, alpha·1e6 as
    * n). Grams round-trip through UTF-8 strings — they came from text,
    * so the encoding is lossless. */
  def save(lm: BigramLm, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    val m = lm.bc.value
    def rows(kind: String, ks: Array[Array[Byte]], ns: Array[Long]) =
      ks.indices.map(i => (kind,
        new String(ks(i), java.nio.charset.StandardCharsets.UTF_8), ns(i)))
    val meta = Seq(("m", "", m.vocab)) ++
      Seq(("a", "", math.round(lm.alpha * 1e6)))
    (rows("b", m.bigramKeys, m.bigramCounts) ++
     rows("u", m.unigramKeys, m.unigramCounts) ++ meta)
      .toDF("kind", "gram", "n")
      .coalesce(1) // KB-to-MB scale artifact: one tidy file
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]] and re-broadcast it. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BigramLm = {
    val rows = spark.read.parquet(path)
      .select(col("kind"), col("gram"), col("n")).collect()
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val big = rows.filter(_.getString(0) == "b")
    val uni = rows.filter(_.getString(0) == "u")
    val vocab = rows.find(_.getString(0) == "m")
      .getOrElse(throw new IllegalStateException(s"$path: not an LmQuality model (no meta row)"))
      .getLong(2)
    val alpha = rows.find(_.getString(0) == "a")
      .map(_.getLong(2) / 1e6)
      .getOrElse(throw new IllegalStateException(s"$path: not an LmQuality model (no alpha row)"))
    val model = new LmModel(
      big.map(r => utf8(r.getString(1))), big.map(_.getLong(2)),
      uni.map(r => utf8(r.getString(1))), uni.map(_.getLong(2)), vocab)
    BigramLm(spark.sparkContext.broadcast(model), alpha)
  }
}
