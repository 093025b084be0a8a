package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Point-in-time ("as of") join: for every left row, the single right row
 * of the same key with the greatest right timestamp ≤ the left timestamp
 * (backward direction, inclusive — DuckDB `ASOF JOIN` / pandas
 * `merge_asof` semantics; reference engines implement this natively,
 * Spark has no built-in).
 *
 * Spark-first plan: tag both sides, union, ONE shuffle on the key, one
 * per-partition sort on (ts, side), and a running `last(right, ignore
 * nulls)` window — never a range cross join (whose candidate set is
 * |L|·|R| per key) and never a per-row subquery. At 100 TB this is the
 * same shape as any partitioned window aggregate: raw rows shuffle once,
 * each partition streams in timestamp order.
 *
 * Skew caveat (inherent to the shape, shared with every partitioned
 * window operator): all rows of ONE key land in one partition, so a
 * pathologically hot key — more rows than a healthy partition holds —
 * serializes into a single task's sort and, past executor memory,
 * spills. Degradation is graceful (the sort spills, it doesn't fail;
 * ScaleProbe's skewed-key case measures it). For a key whose row count
 * exceeds a partition's budget, [[asofBackwardSalted]] salts the
 * partitioning by a timestamp-range bucket and patches bucket
 * boundaries with a carry pass over per-bucket summaries — same
 * result, raw rows still shuffle once.
 */
object AsofJoin {

  /**
   * @param leftTs/rightTs  numeric event time, same unit both sides
   * @param rightOrder  deterministic order among right rows sharing
   *                    (key, ts) — the LAST one in this order wins
   * @param asofCol     output column holding the matched right row as a
   *                    struct (NULL when nothing precedes the left row)
   * @param tolerance   match only if leftTs − rightTs ≤ tolerance
   */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTs: Column, rightTs: Column,
                   rightOrder: Column = lit(0L),
                   asofCol: String = "asof",
                   tolerance: Option[Long] = None): DataFrame =
    joinImpl(left, right, leftKey, rightKey, leftTs, rightTs, rightOrder,
      asofCol, tolerance, bucketWidth = None)

  /**
   * [[asofBackward]] with skew-resilient partitioning: rows partition on
   * (key, floor(ts / bucketWidth)) so a hot key's rows spread over its
   * time range instead of serializing into one task.
   *
   * Boundary patch: a left row whose bucket holds no earlier right row
   * must match the last right row of an EARLIER bucket. That carry is
   * computed from per-(key, bucket) summaries — the last right row per
   * bucket (a map-side-combined aggregate, one small row per non-empty
   * bucket) run through a per-key running window (small: #buckets rows
   * per key, not raw rows) — and injected into each left bucket as a
   * pseudo right row, where its real (earlier-bucket) timestamp sorts
   * it before everything in the bucket. Raw rows still shuffle exactly
   * once; only bucket summaries pay the extra two small shuffles.
   * Result is identical to [[asofBackward]] for every `bucketWidth`
   * (property-tested), including tolerance gating, which uses the
   * carried row's true timestamp.
   *
   * @param bucketWidth timestamp-range per salt bucket, same unit as
   *   `ts`. Size it so one hot key's rows per bucket fit a task
   *   comfortably, but not so small that per-bucket summaries rival the
   *   data (e.g. an hour of micros for a key logging ~1M events/h).
   */
  def asofBackwardSalted(left: DataFrame, right: DataFrame,
                         leftKey: Column, rightKey: Column,
                         leftTs: Column, rightTs: Column,
                         bucketWidth: Long,
                         rightOrder: Column = lit(0L),
                         asofCol: String = "asof",
                         tolerance: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    joinImpl(left, right, leftKey, rightKey, leftTs, rightTs, rightOrder,
      asofCol, tolerance, Some(bucketWidth))
  }

  private def joinImpl(left: DataFrame, right: DataFrame,
                       leftKey: Column, rightKey: Column,
                       leftTs: Column, rightTs: Column,
                       rightOrder: Column, asofCol: String,
                       tolerance: Option[Long],
                       bucketWidth: Option[Long]): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    def bucketOf(t: Column): Column = bucketWidth match {
      case Some(w) => TimeBuckets.floorBucket(t, w) // exact at ns-scale epochs
      case None => lit(0L) // unsalted: everything in one bucket per key
    }
    val l = left.select(
      leftKey.as("__k"), leftTs.cast("long").as("__t"), lit(1).as("__side"),
      lit(0L).as("__ord"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
      .withColumn("__b", bucketOf(col("__t")))
    // SQL join-equality semantics: NULL never equals NULL, and a NULL
    // right timestamp can never satisfy rightTs <= leftTs. Window
    // partitioning WOULD group all NULL keys together (and a NULL __t
    // sorts first, i.e. "before everything"), so NULL-key/NULL-ts right
    // rows must not enter the match stream; NULL-key left rows stay (and
    // get a NULL match — left-join behavior).
    val r = right.where(rightKey.isNotNull && rightTs.isNotNull).select(
      rightKey.as("__k"), rightTs.cast("long").as("__t"), lit(0).as("__side"),
      rightOrder.cast("long").as("__ord"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
      .withColumn("__b", bucketOf(col("__t")))
    val stream = bucketWidth match {
      case None => l.unionByName(r)
      case Some(_) =>
        // last right row per (key, bucket): (__t, __ord) is a total order
        // among a key's right rows; max_by keeps __r out of the ORDERING
        // expression (a right schema with map columns must stay legal
        // here, exactly as in the unsalted path)
        val rSum = r.groupBy(col("__k"), col("__b"))
          .agg(max_by(struct(col("__t"), col("__ord"), col("__r")),
            struct(col("__t"), col("__ord"))).as("__last"))
        // for each bucket containing left rows, the last right row of any
        // STRICTLY earlier bucket: order (bucket, marker-before-summary)
        // so a marker's running last sees only earlier buckets' summaries
        val lBuckets = l.where(col("__k").isNotNull && col("__t").isNotNull)
          .select(col("__k"), col("__b")).distinct()
        val carryW = Window.partitionBy(col("__k"))
          .orderBy(col("__b"), col("__cs"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val carry = lBuckets
          .withColumn("__cs", lit(0))
          .withColumn("__last", lit(null).cast(rSum.schema("__last").dataType))
          .unionByName(rSum.withColumn("__cs", lit(1)))
          .withColumn("__c", last(col("__last"), ignoreNulls = true).over(carryW))
          .where(col("__cs") === 0 && col("__c").isNotNull)
          // pseudo right row at its TRUE timestamp (strictly below the
          // target bucket's range, so it sorts first there; tolerance
          // gating keeps seeing the real right ts)
          .select(col("__k"), col("__c.__t").as("__t"), lit(0).as("__side"),
            col("__c.__ord").as("__ord"), lit(null).cast(lType).as("__l"),
            col("__c.__r").as("__r"), col("__b"))
        l.unionByName(r).unionByName(carry)
    }
    // right rows sort BEFORE left rows at equal ts (inclusive backward
    // match), and among themselves by the caller's deterministic order
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRow = last(col("__r"), ignoreNulls = true).over(w)
    val matchedTs = last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w)
    val gated = tolerance match {
      case Some(tol) => when(col("__t") - matchedTs <= tol, matchedRow).otherwise(lit(null).cast(rType))
      case None => matchedRow
    }
    stream
      .withColumn("__m", gated)
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__m").as(asofCol)): _*)
  }
}
