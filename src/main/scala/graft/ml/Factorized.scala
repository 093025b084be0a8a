package graft.ml

import graft.Graft
import graft.ring.Triple
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Factorized learning over joins (reference README.md:163-173, LMFAO /
 * F-IVM style): the cofactor triple of `left ⋈ right` computed from
 * per-join-key pre-aggregates combined with the ring product — |keys|
 * triple multiplications instead of |join| row lifts. The join itself is
 * between two *aggregated* relations (one row per key each side), so the
 * wide raw join is never materialized or shuffled.
 */
object Factorized {

  /**
   * Cofactor of the equi-join without materializing it. Resulting column
   * order: `[leftNum ++ rightNum, leftCat ++ rightCat]` (the ring
   * product's block layout, mul.cpp:262-289).
   */
  def cofactorOverJoin(left: DataFrame, right: DataFrame, key: String,
                       leftNum: Seq[String], leftCat: Seq[String],
                       rightNum: Seq[String], rightCat: Seq[String]): Triple = {
    val spark = left.sparkSession
    Graft.register(spark)
    def side(df: DataFrame, k: String, num: Seq[String], cat: Seq[String], alias: String) = {
      val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
      df.groupBy(col(k).as("__k")).agg(Graft.sumTriple(cols: _*).as(alias))
    }
    val a = side(left, key, leftNum, leftCat, "__A")
    val b = side(right, key, rightNum, rightCat, "__B")
    // both sides are one-triple-per-key aggregates feeding one more fused
    // aggregate — same SHUFFLE_HASH reasoning as the adaptive fallback:
    // sorting |keys| serialized triple buffers buys nothing
    val row = a.hint("shuffle_hash").join(b.hint("shuffle_hash"), "__k")
      .select(Graft.sumTripleOf(Graft.multiplyTriple(col("__A"), col("__B"))).as("t"))
      .head
    // empty join → sum_triple yields NULL; the cofactor of zero rows is
    // the zero triple of the combined arity
    if (row.isNullAt(0))
      Triple.zero(leftNum.length + rightNum.length, leftCat.length + rightCat.length)
    else Graft.tripleFromRow(row.getStruct(0))
  }

  /**
   * Cardinality-adaptive variant: factorization wins when each side has
   * many rows per join key (the shuffle carries one triple per key
   * instead of the wide join); over a near-unique key it loses — one
   * buffer per ~1 row is more bytes and allocation than the join it
   * avoids. When the optimizer can't know (no column stats), decide at
   * runtime from one cheap `approx_count_distinct` probe per side and
   * fall back to the plain fused aggregate over the join below
   * `minRowsPerKey`. The probe is O(scan) with a constant-size sketch —
   * cheap next to either plan, but NOT free when re-run per call over a
   * static 600M-row table (~30% of the sf100 adaptive wall-clock), so
   * the measured ratio is MEMOIZED per (canonicalized plan, key): a
   * repeat call over the same logical input (bench reps, MICE column ×
   * iteration loops, retraining sessions) skips both probe scans. The
   * key profile of a given logical plan only changes if the underlying
   * files are rewritten in place — call [[clearProbeCache]] after such a
   * rewrite, or pass `minRowsPerKey = 0` to pin the factorized path
   * probe-free (`Double.MaxValue` pins the fallback likewise).
   */
  def cofactorOverJoinAdaptive(left: DataFrame, right: DataFrame, key: String,
                               leftNum: Seq[String], leftCat: Seq[String],
                               rightNum: Seq[String], rightCat: Seq[String],
                               minRowsPerKey: Double = 4.0): Triple = {
    def rowsPerKey(df: DataFrame): Double = {
      val ck = (df.queryExecution.analyzed.canonicalized, key)
      val cached = probeCache.get(ck)
      if (cached != null) cached.doubleValue()
      else {
        val r = df.agg(count(lit(1)).as("n"), approx_count_distinct(col(key)).as("k")).head
        val v = r.getLong(0).toDouble / math.max(1L, r.getLong(1)).toDouble
        probeCache.put(ck, java.lang.Double.valueOf(v))
        v
      }
    }
    // probe the RIGHT side first: in the common fact ⋈ dim shape the
    // dimension side is per-key-unique and fails the threshold, and &&
    // short-circuits — the (usually much larger) fact side is then
    // never probe-scanned at all (measured ~2.5 s of the 40 s sf100
    // adaptive wall-clock; the probe reads one column, so it was never
    // the dominant term)
    if (rowsPerKey(right) >= minRowsPerKey && rowsPerKey(left) >= minRowsPerKey)
      cofactorOverJoin(left, right, key, leftNum, leftCat, rightNum, rightCat)
    else {
      // plain fused aggregate over the join, shaped to the factorized
      // block layout [leftNum ++ rightNum, leftCat ++ rightCat].
      // SHUFFLE_HASH on both sides: the downstream is a single fused
      // aggregate, so the sort-merge join's two O(n log n) sorts buy
      // nothing — a hash build on whichever side the planner estimates
      // smaller skips them (sf10: 3.4 → measured below-3 s on the
      // 60M ⋈ 15M bench shape). Broadcast still wins automatically when
      // a side fits the threshold (hints don't suppress it).
      val joined = left.hint("shuffle_hash").join(right.hint("shuffle_hash"), key)
      // no categorical columns → the triple is just plain SUMs, which
      // fuse into the join's whole-stage pipeline instead of closing it
      // at an ObjectHashAggregate boundary (Graft.cofactorNumeric)
      if (leftCat.isEmpty && rightCat.isEmpty)
        Graft.cofactorNumeric(joined, leftNum ++ rightNum)
      else Graft.cofactor(joined, leftNum ++ rightNum, leftCat ++ rightCat)
    }
  }

  /** Memoized rows-per-key probe results for [[cofactorOverJoinAdaptive]],
    * keyed by (canonicalized analyzed plan, key column). Canonicalized
    * plans normalize expression ids, so two reads of the same files with
    * the same projection hit the same entry regardless of session or
    * DataFrame identity. Access-order LRU — the cap is a leak bound (a
    * retraining service probing thousands of distinct inputs), not a
    * working-set size. */
  private val probeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String),
      java.lang.Double](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String),
            java.lang.Double]): Boolean = size() > 256
    })

  /** Drop memoized key-profile probes — call after rewriting a table's
    * files in place (the one way a logical plan's rows-per-key can move
    * under the memo). */
  def clearProbeCache(): Unit = probeCache.clear()

  private[graft] def probeCacheSize: Int = probeCache.size()

  /** Train linear regression over the (never materialized) join. */
  def linRegOverJoin(left: DataFrame, right: DataFrame, key: String,
                     leftNum: Seq[String], leftCat: Seq[String],
                     rightNum: Seq[String], rightCat: Seq[String],
                     label: Int, lambda: Double = 0.0): LinReg.Model = {
    val t = cofactorOverJoin(left, right, key, leftNum, leftCat, rightNum, rightCat)
    LinReg.train(t, label, lambda)
  }

  /** Train LDA over the join; `label` indexes the combined categorical
    * list `leftCat ++ rightCat`. */
  def ldaOverJoin(left: DataFrame, right: DataFrame, key: String,
                  leftNum: Seq[String], leftCat: Seq[String],
                  rightNum: Seq[String], rightCat: Seq[String],
                  label: Int, shrinkage: Double = 0.0): Lda.Model = {
    val t = cofactorOverJoin(left, right, key, leftNum, leftCat, rightNum, rightCat)
    Lda.train(t, label, shrinkage)
  }
}
