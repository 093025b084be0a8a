package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing: assign every document a pack id so the concatenated
 * token stream of each (stratum, pack) targets a fixed `budget` — the
 * fixed-context-window chunking step of an LLM training pipeline.
 *
 * Semantics: documents are laid out in `order` within each stratum; a
 * pack boundary falls every `budget` tokens of the concatenated stream;
 * the document straddling a boundary belongs to the EARLIER pack (pack
 * = tokens-before-this-doc div budget). A pack can therefore overflow
 * by less than one document, and a document longer than the budget owns
 * its pack region — exactly the chunk-then-keep-whole-docs variant of
 * packing. Exact greedy packing (never exceed budget) is a
 * non-associative prefix scan — inherently sequential — while this
 * formulation is ONE window over (stratum, order), so at 100 TB it
 * parallelizes across strata (pack per shard/language, as real
 * pipelines do) with a single shuffle.
 */
object Pack {

  /** Adds `packCol` (BIGINT, 0-based per stratum). Integer `div` keeps
    * the bucketing exact past 2^53 cumulative tokens — a real corpus
    * size — where double division would misbucket. */
  def assign(df: DataFrame, stratum: Column, order: Column, tokens: Column,
             budget: Long, packCol: String = "pack"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(stratum).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(tokens.cast("long")).over(w) - tokens.cast("long")
    df.withColumn("__graft_cb", cumBefore)
      .withColumn(packCol, expr(s"__graft_cb div ${budget}L"))
      .drop("__graft_cb")
  }

  /** Per-(stratum, pack) totals — the audit view: `n_docs`,
    * `total_tokens` (≤ budget + the straddling doc's length − 1). */
  def summary(df: DataFrame, stratum: Column, order: Column, tokens: Column,
              budget: Long): DataFrame =
    assign(df, stratum, order, tokens, budget)
      .groupBy(stratum.as("stratum"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("total_tokens"))
}
