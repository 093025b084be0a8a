package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bucketized range (interval) join: match point rows to interval rows
 * with `lo ≤ point ≤ hi` (optionally also equal on a key). Spark plans a
 * raw inequality join as BroadcastNestedLoopJoin — per-pair evaluation
 * over |points|·|intervals| — which is exactly what a 100 TB engine
 * cannot do. Here both sides hash-shuffle on a BUCKET of width
 * `bucketWidth`: each point lands in one bucket, each interval is
 * exploded into the ⌈span/width⌉+1 buckets it overlaps, the join is a
 * plain equi-join on (key, bucket), and the exact range predicate
 * filters the candidates. Cost is one shuffle per side and candidates
 * only within overlapping buckets — never a nested loop.
 *
 * Pick `bucketWidth` near the typical interval span: much smaller
 * multiplies the interval-side explosion; much larger admits more
 * false candidates per bucket.
 */
object RangeJoin {

  /**
   * @param pointTs   numeric point value (e.g. epoch micros)
   * @param lo/hi     numeric interval bounds, inclusive, on `intervals`
   * @param pointKey/intervalKey  optional equality key (NULL never
   *                  matches, SQL semantics)
   * @param pointCol/intervalCol  output struct column names
   * Returns one row per matching (point, interval) pair.
   */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: Column, lo: Column, hi: Column,
                      bucketWidth: Long,
                      pointKey: Column = lit(0L), intervalKey: Column = lit(0L),
                      pointCol: String = "point", intervalCol: String = "interval",
                      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // exact floor-division bucketing (TimeBuckets: integral div, exact
    // even for ns-scale epochs above 2^53 where double division would
    // land a point one bucket off its enclosing interval — a silent
    // false negative). Buckets are computed on the LONG-truncated value —
    // truncation is monotone, so a point inside [lo, hi] always lands
    // inside the interval's bucket range; the EXACT predicate below runs
    // on the original (possibly fractional) values, so no false matches
    // either.
    def bucketOf(c: Column): Column = TimeBuckets.floorBucket(c, bucketWidth)
    val p = points.where(pointKey.isNotNull && pointTs.isNotNull).select(
      pointKey.as("__k"),
      pointTs.as("__t"),
      bucketOf(pointTs).as("__b"),
      struct(points.columns.map(col): _*).as("__p"))
    // an interval overlaps every bucket from ⌊lo/W⌋ to ⌊hi/W⌋; sequence()
    // materializes that (bounded) bucket list and explode shuffles one
    // copy per bucket — empty intervals (hi < lo) vanish here. A single
    // degenerate open-ended interval (hi = a far-future sentinel) would
    // ask sequence() for billions of elements and kill the job with an
    // opaque error — fail fast with a diagnosable one instead.
    // the guard is fused into sequence()'s upper bound so it provably
    // evaluates BEFORE the huge bucket list could materialize
    val nb = bucketOf(col("__hi")) - bucketOf(col("__lo")) + 1
    val guardedHi = when(nb > maxBucketsPerInterval,
      raise_error(concat(
        lit(s"pointInInterval: an interval spans more than $maxBucketsPerInterval buckets " +
          s"of width $bucketWidth (found "), nb,
        lit(" buckets) — widen bucketWidth, cap the interval, or raise maxBucketsPerInterval")))
        .cast("long"))
      .otherwise(bucketOf(col("__hi")))
    val i = intervals.where(intervalKey.isNotNull && lo.isNotNull && hi.isNotNull).select(
      intervalKey.as("__k"),
      lo.as("__lo"),
      hi.as("__hi"),
      struct(intervals.columns.map(col): _*).as("__i"))
      .where(col("__lo") <= col("__hi"))
      .select(col("__k"), col("__lo"), col("__hi"), col("__i"),
        explode(sequence(bucketOf(col("__lo")), guardedHi)).as("__b"))
    p.join(i, Seq("__k", "__b"))
      .where(col("__t") >= col("__lo") && col("__t") <= col("__hi"))
      .select(col("__p").as(pointCol), col("__i").as(intervalCol))
  }
}
