package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does a `localCheckpoint` PRESERVE a bucketed scan's hash
  * partitioning into a downstream co-located join?
  *
  * Spark's `Dataset.checkpoint` path builds the `LogicalRDD` via
  * `fromDataset`, which rewrites the physical plan's
  * `outputPartitioning` onto the new attributes — so in principle a
  * checkpointed bucketed scan should still satisfy a join's
  * distribution requirement without an exchange. This probe settles it
  * empirically for the MICE star shape (checkpointed filtered fact ⋈
  * bucketed dim on the bucket key) by counting
  * `ShuffleExchangeLike` nodes in the executed plan, checkpoint vs
  * live-scan, at sf0.1-bucketed scale (execution is trivial; the
  * answer is in the plan).
  *
  * Wrote BENCH_CONTEXT round-14: the 277 s → 13 s star-round win is
  * attributed to skipped MATERIALIZATION (2 × 600M-row generations)
  * plus whatever exchange behavior this probe certifies — the claim
  * must match the plan, not an assumption.
  */
object CheckpointPartitioningProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val buckets = if (args.length > 1) args(1).toInt else 64
    val spark = graft.Graft.register(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val li = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/lineitem.parquet",
      "li_bkt_cpprobe", "l_orderkey", Seq("l_orderkey", "l_quantity"),
      s"$dir-bucketed/lineitem", buckets)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val ord = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/orders.parquet",
      "ord_bkt_cpprobe", "o_orderkey", Seq("o_orderkey", "o_totalprice"),
      s"$dir-bucketed/orders", buckets)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val executed = df.queryExecution.executedPlan
      val stripped = executed match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      stripped.collect {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
      }.sum
    }

    val fact = li.withColumn("x_missing",
      when(pmod(col("k"), lit(7)) === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity") * 0.5))

    // live scan: filter + join on the bucket key — the baseline plan
    val live = fact.filter(col("x_missing").isNull).join(ord, Seq("k"), "left")
    println(s"live-scan join exchanges: ${exchanges(live)}")

    // checkpointed fact: same filter + join over the LogicalRDD
    val cp = graft.Graft.checkpoint(fact)
    val viaCp = cp.filter(col("x_missing").isNull).join(ord, Seq("k"), "left")
    println(s"checkpointed join exchanges: ${exchanges(viaCp)}")
    println(s"checkpoint logical partitioning: " +
      cp.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
      }.getOrElse("<none>"))

    // grouped aggregate on the bucket key, both ways
    val liveAgg = fact.groupBy("k").agg(sum("l_quantity"))
    val cpAgg = cp.groupBy("k").agg(sum("l_quantity"))
    println(s"live-scan groupBy exchanges: ${exchanges(liveAgg)}")
    println(s"checkpointed groupBy exchanges: ${exchanges(cpAgg)}")

    // the union-generation shape: union(observed stratum, updated
    // stratum ⋈ dim) + explicit repartition(key)+sortWithinPartitions
    // before the checkpoint (the chained-MICE per-column handoff).
    // DOCUMENTS A KNOWN AQE BOUNDARY, not a win: Spark's UnionExec
    // reports the children's common hash partitioning (zipped union)
    // over the bucketed branches, so EnsureRequirements elides the
    // "redundant" user repartition — and DisableUnnecessaryBucketedScan
    // then disables the bucketed scans, because nothing INSIDE the
    // checkpointed sub-query requires the distribution (the consumers
    // live beyond the checkpoint boundary, invisible to the planner).
    // The stored generation reports UnknownPartitioning and the
    // downstream join/groupBy pay one exchange each. Expected: 1 and 1
    // below — if a Spark upgrade ever prints 0s, the chained-MICE
    // generation handoff can drop its per-iteration exchanges too.
    val updated = fact.filter(col("x_missing").isNull).join(ord, Seq("k"), "left")
      .withColumn("x_missing", coalesce(col("o_totalprice") * 0.001, lit(0.0)))
      .select(fact.columns.map(col): _*)
    val gen = graft.Graft.checkpoint(
      fact.filter(col("x_missing").isNotNull).unionByName(updated)
        .repartition(buckets, col("k")).sortWithinPartitions(col("k")))
    println(s"repartitioned-generation logical partitioning: " +
      gen.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
      }.getOrElse("<none>"))
    val genJoin = gen.filter(col("x_missing").isNull).join(ord, Seq("k"), "left")
    println(s"repartitioned-generation join exchanges: ${exchanges(genJoin)}")
    val genAgg = gen.groupBy("k").agg(sum("l_quantity"))
    println(s"repartitioned-generation groupBy exchanges: ${exchanges(genAgg)}")

    // ... and a generation that ENDS in a grouped aggregate (the dedup
    // connected-components round shape): the aggregate leaves data
    // hash-clustered on the group key; the checkpoint must keep it
    val agg = graft.Graft.checkpoint(
      fact.groupBy("k").agg(sum("l_quantity").as("q")))
    val aggJoin = agg.join(ord, Seq("k"), "left")
    println(s"aggregate-generation join exchanges: ${exchanges(aggJoin)}")

    graft.Graft.dropCheckpoint(gen)
    graft.Graft.dropCheckpoint(agg)
    graft.Graft.dropCheckpoint(cp)
    spark.stop()
  }
}
