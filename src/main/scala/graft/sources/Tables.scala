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
    * repeated factorized training). Pre-shuffled to `buckets` partitions
    * so each bucket lands in ONE file (repartition and bucketBy share
    * Murmur3 `pmod` hashing) instead of #writeTasks × #buckets
    * fragments. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Bucketized EXTERNAL copy of `srcParquet` (projected to `cols`) at
    * `path`, registered as `table`. Bucket metadata lives in the session
    * catalog, so a FRESH session must re-attach before the bucketed scan
    * is recognized — this helper makes the bucketize-once pattern
    * session-independent: already-attached → reuse; files on disk →
    * CREATE TABLE … CLUSTERED BY … LOCATION (metadata-only, instant);
    * else pay the one-time write, pre-shuffled to `buckets` partitions
    * so each bucket lands in ONE file (repartition and bucketBy share
    * Murmur3 `pmod` hashing) instead of #writeTasks × #buckets
    * fragments. */
  def attachOrWriteBucketed(spark: SparkSession, srcParquet: String,
                            table: String, key: String, cols: Seq[String],
                            path: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (!spark.catalog.tableExists(table)) {
      val src = spark.read.parquet(srcParquet).select(cols.map(col): _*)
      // attach only to a COMPLETED write: check through the Hadoop
      // filesystem (java.io.File is local-only — on HDFS/S3 it would
      // silently re-pay the write every session) and require the
      // _SUCCESS marker, so an interrupted write is redone rather than
      // attached as silently-incomplete bucket data
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val completed = fs.exists(hPath) &&
        fs.exists(new org.apache.hadoop.fs.Path(hPath, "_SUCCESS"))
      if (completed) {
        spark.sql(s"""CREATE TABLE $table (${src.schema.toDDL})
          USING parquet CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
          LOCATION '$path'""")
      } else {
        src.repartition(buckets, col(key))
          .write.mode("overwrite").option("path", path)
          .bucketBy(buckets, key).sortBy(key)
          .format("parquet").saveAsTable(table)
      }
    }
    spark.table(table)
  }
}
