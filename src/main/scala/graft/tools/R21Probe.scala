package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 builder-side measurement probe: warmed phase decomposition
  * of minhash_neardup (the r20 verdict's #1 main-tier row) plus a warmed
  * A/B of the full operator, at any tier. Methodology matches the bench:
  * fresh session config, N warmups, median of reps. Not in any query
  * path.
  *
  * Usage: runMain graft.tools.R21Probe [dataDir] [reps] [warmups]
  */
object R21Probe {
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val warmups = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)

    def docsAll(): DataFrame = {
      val base = spark.read.parquet(dir + "/documents.parquet")
        .select(col("doc_id"), col("text"))
      val mangled = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
      base.unionByName(mangled)
    }

    def timed(name: String)(f: => Unit): Unit = {
      (1 to warmups).foreach(_ => f)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: median ${median(ts)}%.3f s  (all: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    // ---- full operator (the bench row's body)
    timed("full dedupNear")(
      Dedup.dedupNear(docsAll(), "doc_id", "text", 0.8)
        .write.format("noop").mode("overwrite").save())

    // ---- phases, each from a fresh un-persisted frame so the phase
    // boundaries match the operator's own
    timed("phase prepare+persist") {
      val prep = docsAll().select(col("doc_id"),
          Dedup.minhashPrepare(col("text")).as("__p"))
        .select(col("doc_id"),
          col("__p").getField("bands").as("__bands"),
          col("__p").getField("sh").as("__sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prep.count()
      prep.unpersist(blocking = true)
    }

    // persisted prepare reused across the remaining phase timings
    val prep = docsAll().select(col("doc_id"),
        Dedup.minhashPrepare(col("text")).as("__p"))
      .select(col("doc_id"),
        col("__p").getField("bands").as("__bands"),
        col("__p").getField("sh").as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prep.count()

    timed("phase lsh pairs (from warm cache)")(
      Dedup.lshCandidatePairs(prep, col("doc_id"), col("__bands"))
        .write.format("noop").mode("overwrite").save())

    val cands = Dedup.lshCandidatePairs(prep, col("doc_id"), col("__bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands.count()

    timed("phase verify join (from warm caches)") {
      val a = prep.select(col("doc_id").as("idA"), col("__sh").as("__sa"))
      val b = prep.select(col("doc_id").as("idB"), col("__sh").as("__sb"))
      val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("double")
      val uni = size(array_union(col("__sa"), col("__sb"))).cast("double")
      cands.join(a, "idA").join(b, "idB")
        .withColumn("jaccard", when(uni === 0, lit(0.0)).otherwise(inter / uni))
        .filter(col("jaccard") >= 0.8)
        .select(col("idA"), col("idB"), col("jaccard"))
        .write.format("noop").mode("overwrite").save()
    }
    cands.unpersist(blocking = true)
    prep.unpersist(blocking = true)
    spark.stop()
  }
}
