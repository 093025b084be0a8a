package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 A/B of LSH candidate-pair generation formulations over the
  * SAME warm prepared cache (ids + band hashes):
  *
  *  A. current operator: groupBy-count sizes → join hot back → self-join
  *     → distinct (2 full-stream-ish exchanges: sizes partials + members)
  *  B. window count over one exchange → filter → self-join → distinct
  *     (1 full-stream exchange; skew buffers in WindowExec, spills)
  *  C. repartition+sortWithinPartitions → mapPartitions pair emit →
  *     distinct (1 full-stream exchange + sort, no join, cap streamed)
  *
  * Checks all three produce the identical pair set, then times each
  * warmed (median of reps). Not in any query path.
  *
  * Usage: runMain graft.tools.R21LshAb [dataDir] [reps] [warmups]
  */
object R21LshAb {
  private val cap = 200

  def pairsB(prep: DataFrame): DataFrame = {
    val exploded = prep.select(col("doc_id").as("__id"),
      posexplode(col("__bands")).as(Seq("__band", "__bucket")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__band"), col("__bucket"))
    val ok = exploded.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= 2 && col("__n") <= cap)
    val a = ok.select(col("__band"), col("__bucket"), col("__id").as("idA"))
    val b = ok.select(col("__band"), col("__bucket"), col("__id").as("idB"))
    a.join(b, Seq("__band", "__bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"))
      .distinct()
  }

  def pairsC(prep: DataFrame): DataFrame = {
    val spark = prep.sparkSession
    val exploded = prep.select(col("doc_id").as("__id"),
      posexplode(col("__bands")).as(Seq("__band", "__bucket")))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idA",
        prep.schema("doc_id").dataType, nullable = true),
      org.apache.spark.sql.types.StructField("idB",
        prep.schema("doc_id").dataType, nullable = true)))
    exploded
      .repartition(col("__band"), col("__bucket"))
      .sortWithinPartitions(col("__band"), col("__bucket"), col("__id"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[org.apache.spark.sql.Row] {
          private var out: java.util.Iterator[org.apache.spark.sql.Row] =
            java.util.Collections.emptyIterator()
          private def refill(): Unit = {
            while (!out.hasNext && buf.hasNext) {
              val band = buf.head.getInt(1); val bucket = buf.head.getLong(2)
              val ids = new scala.collection.mutable.ArrayBuffer[Long](8)
              var n = 0
              while (buf.hasNext && buf.head.getInt(1) == band && buf.head.getLong(2) == bucket) {
                val r = buf.next(); n += 1
                if (n <= cap) ids += r.getLong(0)
              }
              if (n >= 2 && n <= cap) {
                val acc = new java.util.ArrayList[org.apache.spark.sql.Row](n * (n - 1) / 2)
                var i = 0
                while (i < ids.length) {
                  var j = i + 1
                  while (j < ids.length) {
                    acc.add(org.apache.spark.sql.Row(ids(i), ids(j))); j += 1
                  }
                  i += 1
                }
                out = acc.iterator()
              }
            }
          }
          override def hasNext: Boolean = { refill(); out.hasNext }
          override def next(): org.apache.spark.sql.Row = { refill(); out.next() }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .distinct()
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
    val base = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mangled = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
    val prep = base.unionByName(mangled).select(col("doc_id"),
        Dedup.minhashPrepare(col("text")).as("__p"))
      .select(col("doc_id"), col("__p").getField("bands").as("__bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("docs=" + prep.count())

    val pa = Dedup.lshCandidatePairs(prep, col("doc_id"), col("__bands"))
    val pb = pairsB(prep)
    val pc = pairsC(prep)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(col("idA") * 31 + col("idB")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (sa, sb, sc) = (sig(pa), sig(pb), sig(pc))
    println(s"A=$sa B=$sb C=$sc identical=${sa == sb && sb == sc}")
    require(sa == sb && sb == sc, "pair sets differ")

    def timed(name: String)(df: => DataFrame): Unit = {
      def run(): Unit = df.write.format("noop").mode("overwrite").save()
      (1 to warmups).foreach(_ => run())
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: median ${R21Probe.median(ts)}%.3f s  (all: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    timed("A groupBy+join (current)")(Dedup.lshCandidatePairs(prep, col("doc_id"), col("__bands")))
    timed("B window")(pairsB(prep))
    timed("C sorted mapPartitions")(pairsC(prep))
    spark.stop()
  }
}
