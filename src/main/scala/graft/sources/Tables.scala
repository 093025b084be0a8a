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
}
