package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 A/B of the dedupLines hot-line guard on a corpus with a
  * dominant boilerplate line (the skew shape the guard exists for):
  * every document gets the same injected footer line, so the unguarded
  * window serializes footer occurrences into ONE task group while the
  * guard routes them around the window via a broadcast-joined exact
  * aggregate. Times both on the same corpus, checks identical outputs.
  *
  * Usage: runMain graft.tools.R21HotLinesAb [dataDir] [reps] [warmups]
  */
object R21HotLinesAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val warmups = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    val corpus = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"),
        concat(
          array_join(graft.functions.TextFunctions.chunkText(col("text"), 4, 0), "\n"),
          lit("\nGRAFT COOKIE BANNER FOOTER - ACCEPT ALL COOKIES TO CONTINUE")).as("text"))
    println("docs=" + corpus.count())

    def sig(threshold: Long): (Long, Long) = {
      val d = Dedup.dedupLines(corpus, "doc_id", "text", 2L, hotLineThreshold = threshold)
      val r = d.agg(sum(col("n_removed_lines")).cast("long"),
        sum(xxhash64(col("text")) % 1000000007L)).head()
      (r.getLong(0), r.getLong(1))
    }
    val (su, sg) = (sig(0L), sig(10000L))
    println(s"unguarded=$su guarded=$sg identical=${su == sg}")
    require(su == sg, "guarded output diverges")

    def timed(name: String, threshold: Long): Unit = {
      def run(): Unit =
        Dedup.dedupLines(corpus, "doc_id", "text", 2L, hotLineThreshold = threshold)
          .write.format("noop").mode("overwrite").save()
      (1 to warmups).foreach(_ => run())
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: median ${R21Probe.median(ts)}%.3f s  (all: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    timed("unguarded window (hot corpus)", 0L)
    timed("guarded (threshold 10k)", 10000L)
    spark.stop()
  }
}
