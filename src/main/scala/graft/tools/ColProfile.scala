package graft.tools

import graft.agg.ColumnarCofactor
import graft.agg.ColumnarCofactor._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stage ladder for the columnar cofactor kernel (FactProfile
 * discipline: time each stage in isolation, name the dominant part
 * before optimizing it). Stages on the sf100 lineitem scan:
 *
 *   1. batch iteration only (IO + footer + lazy page handles)
 *   2. + numeric materialization (decode 4 double columns)
 *   3. + numeric moments (4 sums + 10 pair products)
 *   4. + cat materialization (decode linenumber int + shipdate→year)
 *   5. full kernel (adds the per-row categorical map updates)
 *   6. full kernel, pricing shape (packed strings + derived column)
 */
object ColProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    // optional reader-tuning axes: [maxPartitionBytes] [batchSize] [rebaseMode]
    val mpb = if (args.length > 1) args(1) else "134217728"
    val cbs = if (args.length > 2) args(2) else "4096"
    val rebase = if (args.length > 3) args(3) else "EXCEPTION"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .config("spark.sql.parquet.columnarReaderBatchSize", cbs)
      .config("spark.sql.parquet.datetimeRebaseModeInRead", rebase)
      .getOrCreate()
    println(s"[colprofile] maxPartitionBytes=$mpb batchSize=$cbs rebase=$rebase")
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, dir, "lineitem")
    li.count() // warm file listing/footers

    def time(tag: String)(f: => Unit): Unit = {
      // 2 passes, report both (first pays codegen/JIT)
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"[colprofile] $tag pass$p: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val nums = Seq(NumCol("l_quantity"), NumCol("l_extendedprice"), NumCol("l_discount"), NumCol("l_tax"))
    val numNames = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

    // stages 1-4 run through the same harvest machinery with the kernel
    // truncated via ColumnarCofactor.profileStage
    time("1 iterate-only")(ColumnarCofactor.profileStage(li, numNames, Seq("l_linenumber"), Seq("l_shipdate"), 1))
    time("2 +num-decode")(ColumnarCofactor.profileStage(li, numNames, Seq("l_linenumber"), Seq("l_shipdate"), 2))
    time("3 +num-moments")(ColumnarCofactor.profileStage(li, numNames, Seq("l_linenumber"), Seq("l_shipdate"), 3))
    time("4 +cat-decode")(ColumnarCofactor.profileStage(li, numNames, Seq("l_linenumber"), Seq("l_shipdate"), 4))
    time("5 full-kernel") {
      ColumnarCofactor.cofactor(li, nums, Seq(CatCol("l_linenumber"), CatYear("l_shipdate")))
        .getOrElse(sys.error("harvest must engage"))
    }
    time("6 full-pricing") {
      ColumnarCofactor.cofactor(li,
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice"),
          NumDerived(Seq("l_extendedprice", "l_discount"), "dp",
            (in, out, n) => { var r = 0; while (r < n) { out(r) = in(0)(r) * (1.0 - in(1)(r)); r += 1 } })),
        Seq(CatPackedStrings(Seq("l_returnflag", "l_linestatus"))))
        .getOrElse(sys.error("harvest must engage"))
    }

    // filtered scan: compiled mask vs the row-path FilterExec + aggregate
    graft.Graft.register(spark)
    val filt = li.filter(
      col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
      col("l_quantity") < 30)
    time("7 filtered-columnar") {
      ColumnarCofactor.cofactor(filt, nums, Seq(CatCol("l_linenumber"), CatYear("l_shipdate")))
        .getOrElse(sys.error("filtered harvest must engage"))
    }
    time("8 filtered-row-agg") {
      graft.Graft.tripleFromRow(filt
        .withColumn("y", year(col("l_shipdate")))
        .agg(graft.Graft.sumTriple(
          (numNames.map(col) :+ col("l_linenumber") :+ col("y")): _*).as("t"))
        .head().getStruct(0))
    }
    spark.stop()
  }
}
