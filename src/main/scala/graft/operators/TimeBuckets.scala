package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Exact floor-division time bucketing, shared by the bucketized
 * operators ([[RangeJoin]], [[AsofJoin.asofBackwardSalted]]).
 *
 * `/` on long Columns is DOUBLE division in Spark, and above 2⁵³ a long
 * no longer round-trips through double — at ns-scale epochs (~1.8e18,
 * ulp 256) the rounded numerator can truncate to the NEIGHBORING
 * bucket. That is fatal for bucket-equality joins (a point and its
 * enclosing interval disagree on the bucket → silent false negatives)
 * and for the salted as-of carry ordering (bucket ids must be monotone
 * in ts). Integral `div` keeps the arithmetic in longs end-to-end:
 * `c − pmod(c, w)` is an exact multiple of `w` (pmod supplies floor
 * semantics for negative timestamps), and integral division of an
 * exact multiple is exact at any magnitude.
 */
private[graft] object TimeBuckets {
  def floorBucket(c: Column, bucketWidth: Long): Column = {
    val l = c.cast("long")
    call_function("div", l - pmod(l, lit(bucketWidth)), lit(bucketWidth))
  }
}
