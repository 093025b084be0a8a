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
 * ScaleProbe's skewed-key case measures it), but a key whose row count
 * exceeds a partition's budget needs a salted two-pass variant (bucket
 * by ts-range within the hot key, as-of join per bucket, then patch
 * bucket boundaries with the previous bucket's last right row) — not
 * built in, because below that extreme AQE + spilling handle it and the
 * patch pass would cost every caller a second shuffle.
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
                   tolerance: Option[Long] = None): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(
      leftKey.as("__k"), leftTs.cast("long").as("__t"), lit(1).as("__side"),
      lit(0L).as("__ord"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
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
    // right rows sort BEFORE left rows at equal ts (inclusive backward
    // match), and among themselves by the caller's deterministic order
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRow = last(col("__r"), ignoreNulls = true).over(w)
    val matchedTs = last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w)
    val gated = tolerance match {
      case Some(tol) => when(col("__t") - matchedTs <= tol, matchedRow).otherwise(lit(null).cast(rType))
      case None => matchedRow
    }
    l.unionByName(r)
      .withColumn("__m", gated)
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__m").as(asofCol)): _*)
  }
}
