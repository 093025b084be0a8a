package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table loading (TESTDATA.md: TPC-H-ish star schema +
  * events/documents/embeddings) — parquet scans with pushdown intact. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Persist a bucketed+sorted copy in the session catalog: subsequent
    * equi-joins/aggregations on `key` between tables bucketed the same
    * way are shuffle-free (co-located scan). The 100 TB pattern for fact
    * tables joined repeatedly on the same key (e.g. MICE over a join or
    * repeated factorized training). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
