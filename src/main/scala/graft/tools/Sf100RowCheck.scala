package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated re-timing of the sf100 short scan rows that drifted
  * +20-35% in the round-14 working-tree bench runs vs the committed
  * r13 baseline — fresh JVM, nothing else first, same shapes as
  * Bench's sf100 tier. Distinguishes a code/toolchain regression from
  * inter-row contention inside the long bench process. */
object Sf100RowCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import graft.agg.ColumnarCofactor._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    for (p <- 1 to 4) {
      var t0 = System.nanoTime()
      cofactor(li, Seq(NumCol("l_quantity"), NumCol("l_extendedprice"),
        NumCol("l_discount"), NumCol("l_tax")),
        Seq(CatCol("l_linenumber"), CatYear("l_shipdate"))).get
      val full = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      cofactor(li.filter(col("l_shipdate") <= lit("1998-09-02").cast("date")),
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice")), Seq(CatCol("l_linenumber"))).get
      val filt = (System.nanoTime() - t0) / 1e9
      println(f"pass$p: cofactor_columnar=$full%.2f s cofactor_filtered=$filt%.2f s")
    }
    spark.stop()
  }
}
