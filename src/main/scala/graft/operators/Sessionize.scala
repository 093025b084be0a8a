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
   * Adds a session column (1-based per-key session number).
   *
   * @param key        partition key (e.g. user id)
   * @param ts         numeric event time (any unit, e.g. epoch micros)
   * @param tiebreak   deterministic order within equal timestamps
   * @param maxGap     same unit as `ts`; a larger gap starts a new session
   * @param sessionCol name of the added column — pass a fresh name if the
   *                   input already has a `session` column (the default
   *                   would silently overwrite it, `withColumn` semantics)
   */
  def assign(df: DataFrame, key: Column, ts: Column, tiebreak: Column, maxGap: Long,
             sessionCol: String = "session"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val newSession = when(lag(ts, 1).over(w).isNull || ts - lag(ts, 1).over(w) > maxGap, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-key session summary: session count, event count, largest
    * session (one aggregation over [[assign]]'s output).
    *
    * @param keyCol output name for the key column — pass an explicit name
    *               when the input already has a `key` column (the default
    *               alias would be an ambiguous reference) */
  def summary(df: DataFrame, key: Column, ts: Column, tiebreak: Column, maxGap: Long,
              keyCol: String = "key"): DataFrame = {
    // session/count work columns are chosen to dodge the input's schema
    val session = Iterator.from(0).map(i => s"__session$i")
      .find(c => !df.columns.contains(c)).get
    assign(df, key, ts, tiebreak, maxGap, session)
      .groupBy(key.as(keyCol), col(session))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("__cnt")).as("n_events"),
        max(col("__cnt")).as("max_sess_events"))
  }
}
