package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-decompose lshCandidatePairs at any tier: the MinhashProbe ladder
  * shows "lsh bucket + pair gen" as the dominant near-dedup phase at
  * sf1 (3.6 s for 55k docs × 16 bands = 880k exploded rows — far above
  * what a count-aggregate + two small joins should cost). Times each
  * sub-plan: explode+count, bucket sizes, hot filter + members join,
  * pair self-join, distinct. */
object LshPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    val base = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mangled = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
    val docs = base.unionByName(mangled)
    val prep = docs.select(col("doc_id"), Dedup.minhashPrepare(col("text")).as("__p"))
      .select(col("doc_id"), col("__p").getField("bands").as("__bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prep.count()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val exploded = prep.select(col("doc_id").as("__id"),
        posexplode(col("__bands")).as(Seq("__band", "__bucket")))
      t("explode+count(*)")(println("  rows=" + exploded.count()))
      val sizes = exploded.groupBy("__band", "__bucket").agg(count(lit(1)).as("__n"))
      t("bucket sizes agg")(println("  buckets=" + sizes.count()))
      val hot = sizes.filter(col("__n") >= 2 && col("__n") <= 200)
        .select(col("__band"), col("__bucket"))
      t("hot filter count")(println("  hot=" + hot.count()))
      val members = exploded.join(hot, Seq("__band", "__bucket"))
      t("members join")(println("  members=" + members.count()))
      val a = members.select(col("__band"), col("__bucket"), col("__id").as("idA"))
      val b = members.select(col("__band"), col("__bucket"), col("__id").as("idB"))
      val pairs = a.join(b, Seq("__band", "__bucket"))
        .filter(col("idA") < col("idB")).select(col("idA"), col("idB"))
      t("pair self-join")(println("  pairs=" + pairs.count()))
      t("pairs distinct")(println("  distinct=" + pairs.distinct().count()))
      t("full lshCandidatePairs")(println("  cands=" +
        Dedup.lshCandidatePairs(prep, col("doc_id"), col("__bands")).count()))
    }
    spark.stop()
  }
}
