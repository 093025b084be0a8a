package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: remove training documents that share word
 * n-grams with an evaluation/benchmark set — the standard guard against
 * test-set leakage in training-data pipelines.
 *
 * Scale shape (the eval set is always tiny next to the corpus):
 *   1. bench → distinct shingle hashes (KBs–MBs) → **broadcast**;
 *   2. corpus → one pass: shingle-hash explode → broadcast semi-join —
 *      only rows whose shingle hits the bench set survive, so the
 *      follow-up per-doc overlap count aggregates a near-empty stream;
 *   3. contaminated ids anti-join back onto the corpus (AQE broadcasts
 *      the id list when it is small, which it is unless the corpus IS
 *      the benchmark).
 * Nothing is ever collected to the driver and the corpus is never
 * joined against itself, so the plan survives a 100 TB corpus as long
 * as the benchmark side stays broadcastable (eval sets are ≤ millions
 * of shingles).
 *
 * Shingle semantics follow [[graft.functions.SimHash]]'s `Shingling`
 * walker: documents shorter than `n` tokens contribute their whole
 * token sequence as one shingle, so short duplicates still collide.
 */
object Decontaminate {

  /** Distinct shingle-hash set of the benchmark (one row per hash). */
  private def benchShingles(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(array_distinct(
      TextFunctions.shingleHashes(col(textCol), n))).as("__h")).distinct()

  /** ids of corpus docs sharing ≥ `minOverlap` distinct `n`-gram
    * shingles with ANY benchmark document. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame, idCol: String,
                      textCol: String, n: Int = 8, minOverlap: Int = 1): DataFrame = {
    require(n > 0, s"shingle size must be positive, got $n")
    require(minOverlap > 0, s"minOverlap must be positive, got $minOverlap")
    val corpusSh = corpus.select(col(idCol), explode(array_distinct(
      TextFunctions.shingleHashes(col(textCol), n))).as("__h"))
    corpusSh.join(broadcast(benchShingles(bench, textCol, n)), Seq("__h"))
      .groupBy(idCol).agg(count(lit(1)).as("__overlap"))
      .filter(col("__overlap") >= minOverlap)
      .select(col(idCol))
  }

  /** The corpus minus contaminated documents (column set unchanged). */
  def clean(corpus: DataFrame, bench: DataFrame, idCol: String,
            textCol: String, n: Int = 8, minOverlap: Int = 1): DataFrame =
    corpus.join(contaminatedIds(corpus, bench, idCol, textCol, n, minOverlap),
      Seq(idCol), "left_anti")
}
