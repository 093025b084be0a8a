package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the layout-preserving checkpoint (`Graft.checkpoint`):
  *
  *  1. An AGGREGATE-tailed generation keeps its hash clustering — the
  *     next round's join/groupBy on the same key plans ZERO exchanges
  *     on the checkpointed side (the dedup connected-components shape;
  *     the public `localCheckpoint` pays one per consumer —
  *     `tools/CheckpointPartitioningProbe` measures both).
  *  2. Values and schema are identical to the source plan.
  *  3. A DataFrame whose blocks were released by `dropCheckpoint`
  *     remains CONSUMABLE — blocks are plain-persisted, so a dropped
  *     generation recomputes deterministically from the frozen physical
  *     plan instead of `localCheckpoint`'s unrecoverable-block failure.
  *     (Callers drop superseded generations; nothing should consume
  *     them again, but a late consumer degrading to recompute beats a
  *     crash at cluster scale.)
  */
class CheckpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    p.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => 1
    }.sum
  }

  test("aggregate-tailed checkpoint keeps clustering: self-shaped join plans no new exchange") {
    val base = spark.range(10000).select((col("id") % 97).as("id"), col("id").as("v"))
    val labels = Graft.checkpoint(base.groupBy("id").agg(min("v").as("component")))
    val next = Graft.checkpoint(base.groupBy("id").agg(max("v").as("c2")))
    // both sides carry HashPartitioning(id) out of their checkpoints —
    // the CC round's convergence join plans with NO exchange at all
    val joined = next.join(labels, "id")
    assert(shuffles(joined) == 0,
      s"expected exchange-free join over two aggregate-tailed checkpoints, got plan:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 97)
    Graft.dropCheckpoint(labels); Graft.dropCheckpoint(next)
  }

  test("checkpoint is value- and schema-transparent") {
    val src = spark.range(5000).select(col("id").as("k"),
      (col("id") % 13).cast("double").as("x"),
      concat(lit("s"), (col("id") % 7).cast("string")).as("s"))
    val cp = Graft.checkpoint(src)
    assert(cp.schema == src.schema)
    assert(cp.orderBy("k").collect().toSeq == src.orderBy("k").collect().toSeq)
    Graft.dropCheckpoint(cp)
  }

  test("a dropped checkpoint recomputes instead of failing") {
    val cp = Graft.checkpoint(
      spark.range(1000).select((col("id") % 10).as("g"), col("id").as("v"))
        .groupBy("g").agg(sum("v").as("s")))
    assert(cp.count() == 10)
    Graft.dropCheckpoint(cp) // blocks released
    // a late consumer recomputes from the frozen physical plan — same
    // values, no "checkpoint block not found" failure
    assert(cp.count() == 10)
    assert(cp.agg(sum("s")).head.getLong(0) == (0L until 1000).sum)
  }
}
