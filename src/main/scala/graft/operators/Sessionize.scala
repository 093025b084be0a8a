package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: events of one key belong to the same
 * session while consecutive event-time gaps stay ≤ `maxGap`. The
 * classic log-analytics operator — one shuffle on the key, one
 * per-partition sort, two window passes (new-session flag, then a
 * running sum that numbers the sessions). Nothing leaves the executor;
 * at scale this is the same shape as any partitioned window aggregate.
 */
object Sessionize {

  /**
   * Adds a `session` column (1-based per-key session number).
   *
   * @param key      partition key (e.g. user id)
   * @param ts       numeric event time (any unit, e.g. epoch micros)
   * @param tiebreak deterministic order within equal timestamps
   * @param maxGap   same unit as `ts`; a larger gap starts a new session
   */
  def assign(df: DataFrame, key: Column, ts: Column, tiebreak: Column, maxGap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val newSession = when(lag(ts, 1).over(w).isNull || ts - lag(ts, 1).over(w) > maxGap, 1L)
      .otherwise(0L)
    df.withColumn("session",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-key session summary: session count, event count, largest
    * session (one aggregation over [[assign]]'s output). */
  def summary(df: DataFrame, key: Column, ts: Column, tiebreak: Column, maxGap: Long): DataFrame =
    assign(df, key, ts, tiebreak, maxGap)
      .groupBy(key.as("key"), col("session"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("__cnt")).as("n_events"),
        max(col("__cnt")).as("max_sess_events"))
}
