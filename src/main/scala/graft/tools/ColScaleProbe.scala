package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mirror of the reference's column-scalability experiment hook
  * (imputation/include/column_scalability.h:6-8 — MICE cost as the
  * column count grows; the paper's third workload). The reference's
  * generated aggregates cap at 20×20 columns, this engine's generic
  * aggregate + columnar kernel have no such cap — this probe measures
  * the actual width curve instead of asserting it.
  *
  * One wide table (100 derived numeric + 10 small-range categorical +
  * 1 nullable impute target) is written from sf1 lineitem ONCE; each
  * grid cell reads a COLUMN-PRUNED slice, so scan cost scales with the
  * width under test exactly as a real wide table's would. Per cell:
  *
  *   cofactor_nN_cC   full cofactor triple over N numerics × C
  *                    categoricals via the columnar kernel (engagement
  *                    REQUIRED — a silent row-aggregate fallback would
  *                    time the wrong design)
  *   mice_nN_cC       ONE chained MICE round imputing x_null with all
  *                    N numerics + C categoricals as features
  *
  * Usage: runMain graft.tools.ColScaleProbe [sfDir] [workDir] [passes]
  */
object ColScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val work = if (args.length > 1) args(1) else "/root/repo/testdata-colscale"
    val passes = if (args.length > 2) args(2).toInt else 1
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      // parquet BATCH reading (supportBatch) is tied to codegen's field
      // cap: a >100-column projection silently drops to the row-based
      // reader and the columnar harvest refuses. Raising the cap is the
      // operational knob for wide tables — part of what this probe
      // documents.
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val widePath = s"$work/wide.parquet"
    if (!new java.io.File(s"$widePath/_SUCCESS").exists()) {
      val base = spark.read.parquet(s"$dir/lineitem.parquet")
      // derived numeric features: per-index-distinct mixes of the base
      // numerics, so no column is a scalar multiple of another and the
      // normal matrix stays invertible at every width
      val nums = (0 until 100).map { i =>
        (col("l_quantity") * ((i % 7) + 1) +
          col("l_extendedprice") / (i + 2) +
          col("l_discount") * i + col("l_tax") * ((i % 3) + 1)).as(s"x$i")
      }
      // small-range ints (span 7..16): the realistic dimension-code
      // shape the dense categorical tiers exist for
      val cats = (0 until 10).map { j =>
        pmod(col("l_orderkey") + lit(j), lit(7 + j)).cast("int").as(s"c$j")
      }
      val xnull = when(pmod(col("l_orderkey"), lit(10)) === 0, lit(null))
        .otherwise(col("l_quantity") * 0.5 + col("l_discount") * 3.0)
        .cast("double").as("x_null")
      base.select(nums ++ cats :+ xnull: _*).write.mode("overwrite").parquet(widePath)
      println(s"wide table written: $widePath")
    }

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${ts.min}%.2f s (min of $passes)")
    }

    for (nNum <- Seq(10, 25, 50, 100); nCat <- Seq(0, 5, 10)) {
      val numCols = (0 until nNum).map(i => s"x$i")
      val catCols = (0 until nCat).map(j => s"c$j")
      time(s"cofactor_n${nNum}_c$nCat") {
        val t = graft.agg.ColumnarCofactor.cofactor(
          spark.read.parquet(widePath).select((numCols ++ catCols).map(col): _*),
          numCols.map(graft.agg.ColumnarCofactor.NumCol),
          catCols.map(graft.agg.ColumnarCofactor.CatCol))
        require(t.isDefined, s"columnar harvest must engage at $nNum×$nCat")
        require(t.get.n > 0L)
      }
      time(s"mice_n${nNum}_c$nCat") {
        val slice = spark.read.parquet(widePath)
          .select((numCols ++ catCols :+ "x_null").map(col): _*)
        val cfg = graft.mice.Mice.Config(
          contCols = numCols :+ "x_null", catCols = catCols,
          imputeCont = Seq("x_null"), imputeCat = Seq(), iterations = 1)
        graft.mice.Mice.partitioned(slice, cfg)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
