package graft.tools

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the minhash near-dedup wall-clock (the bench's
  * `minhash_neardup` entry, mirrored exactly: docs ∪ 10% last-word-mangled
  * copies) into its phases at any tier:
  *
  *   scan → tokenize → fused prepare (tokenize+shingle+minhash+bands+
  *   shingle-set) → LSH bucket/pair generation → shingle-set verify join →
  *   full dedupNear
  *
  * Usage: runMain graft.tools.MinhashProbe [dataDir]
  * (default /root/testdata/sf0.1; the sf10 tier is
  * /root/repo/testdata-sf10). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mangled = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
    val docs = base.unionByName(mangled).cache()
    println("docs=" + docs.count())
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.Graft.register(spark)
    // marginal-cost ladder over the same corpus pass
    t("scan+length only")(docs.agg(sum(length(col("text")))).head())
    t("tokenize only")(docs.select(size(TextFunctions.tokens(lower(col("text")))).as("n"))
      .agg(sum(col("n"))).head())
    t("bands only (minhash, no shingle set)")(
      docs.select(size(Dedup.minhashBands(col("text"))).as("n")).agg(sum(col("n"))).head())
    t("fused prepare, no materialize")(
      docs.select(Dedup.minhashPrepare(col("text")).as("__p"))
        .select(size(col("__p").getField("sh")).as("n")).agg(sum(col("n"))).head())
    // the operator's real first stage: prepare + persist both artifacts
    // (fields extracted below the persist — the operator's layout, so the
    // bucket stage's cache reads prune away the shingle sets)
    val prep = docs.select(col("doc_id"), Dedup.minhashPrepare(col("text")).as("__p"))
      .select(col("doc_id"),
        col("__p").getField("bands").as("__bands"),
        col("__p").getField("sh").as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("prepare + persist")(prep.count())
    val prepared = prep
    val cands = t("lsh bucket + pair gen") {
      val c = Dedup.lshCandidatePairs(prepared, col("doc_id"), col("__bands")).cache()
      println("candidates=" + c.count()); c
    }
    t("shingle-set verify join") {
      val a = prepared.select(col("doc_id").as("idA"), col("__sh").as("__sa"))
      val b = prepared.select(col("doc_id").as("idB"), col("__sh").as("__sb"))
      val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("double")
      val uni = size(array_union(col("__sa"), col("__sb"))).cast("double")
      val n = cands.join(a, "idA").join(b, "idB")
        .withColumn("j", when(uni === 0, lit(0.0)).otherwise(inter / uni))
        .filter(col("j") >= 0.8).count()
      println("verified=" + n)
    }
    cands.unpersist(); prep.unpersist()
    t("full dedupNear (operator, cold)")(
      Dedup.dedupNear(docs, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
