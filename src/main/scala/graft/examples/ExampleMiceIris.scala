package graft.examples

import graft.mice.Mice
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's demo contract (main.cpp:40-81), Spark-first: an
 * iris-shaped table (4 continuous features + integer target), seeded 20%
 * MCAR nulls injected into `sepal_length`, `petal_length` and `target`
 * (main.cpp:65-73), then 5 MICE iterations with the full column set
 * (`run_MICE_baseline(con, {4 cont}, {target}, {2 cont}, {target}, 5)`,
 * main.cpp:76).
 *
 * The reference reads Fisher's iris from `../iris.csv`, which is not
 * shipped; [[IrisData]] generates a deterministic stand-in with the
 * classic per-class means/spreads (public summary statistics), which
 * preserves the demo's shape and its measurable outcome: regression
 * imputation beats mean imputation, class imputation beats the mode.
 *
 * Run: `sbt "runMain graft.examples.ExampleMiceIris"`
 */
object IrisData {
  // per-class (sepal_length, sepal_width, petal_length, petal_width)
  // means and within-class standard deviations of the classic dataset
  private val means = Array(
    Array(5.01, 3.43, 1.46, 0.25), // setosa
    Array(5.94, 2.77, 4.26, 1.33), // versicolor
    Array(6.59, 2.97, 5.55, 2.03)) // virginica
  private val sds = Array(
    Array(0.35, 0.38, 0.17, 0.11),
    Array(0.52, 0.31, 0.47, 0.20),
    Array(0.64, 0.32, 0.55, 0.27))

  final case class Row(id: Int, sepal_length: Double, sepal_width: Double,
                       petal_length: Double, petal_width: Double, target: Int)

  /** Deterministic iris-alike: `n` rows, classes balanced in id order. */
  def rows(n: Int = 150, seed: Long = 4L): Seq[Row] = {
    val rng = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      val c = i % 3
      def f(j: Int) = math.max(0.1,
        means(c)(j) + rng.nextGaussian() * sds(c)(j))
      Row(i, f(0), f(1), f(2), f(3), c)
    }
  }

  /** The demo's MCAR mask: for each of the three demo columns, a seeded
    * 20% sample of ids goes NULL (mirrors extract_sample(0.2*size, size,
    * i) with seed = column index, main.cpp:66-71). */
  def maskedIds(n: Int, col: Int): Set[Int] = {
    val rng = new scala.util.Random(col.toLong)
    rng.shuffle((0 until n).toList).take((0.2 * n).toInt).toSet
  }

  def config: Mice.Config = Mice.Config(
    contCols = Seq("sepal_length", "sepal_width", "petal_length", "petal_width"),
    catCols = Seq("target"),
    imputeCont = Seq("sepal_length", "petal_length"),
    imputeCat = Seq("target"),
    iterations = 5) // main.cpp:76

  /** Build the demo tables: (original, with-nulls). */
  def tables(spark: SparkSession, n: Int = 150): (DataFrame, DataFrame) = {
    import spark.implicits._
    val orig = rows(n).toDF()
    val Seq(mSl, mPl, mTg) = Seq(0, 1, 2).map(maskedIds(n, _))
    val masked = orig
      .withColumn("sepal_length",
        when(col("id").isInCollection(mSl), lit(null)).otherwise(col("sepal_length")))
      .withColumn("petal_length",
        when(col("id").isInCollection(mPl), lit(null)).otherwise(col("petal_length")))
      .withColumn("target",
        when(col("id").isInCollection(mTg), lit(null)).otherwise(col("target")))
    (orig, masked)
  }
}

object ExampleMiceIris {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (orig, masked) = IrisData.tables(spark)
    val completed = Mice.baseline(masked, IrisData.config)

    val joined = completed.select(col("id"),
        col("sepal_length").as("sl"), col("petal_length").as("pl"), col("target").as("tg"))
      .join(orig.select(col("id"), col("sepal_length"), col("petal_length"), col("target")), "id")
    val n = orig.count().toInt
    val slRmse = joined.filter(col("id").isInCollection(IrisData.maskedIds(n, 0)))
      .select(sqrt(avg(pow(col("sl") - col("sepal_length"), 2)))).head().getDouble(0)
    val plRmse = joined.filter(col("id").isInCollection(IrisData.maskedIds(n, 1)))
      .select(sqrt(avg(pow(col("pl") - col("petal_length"), 2)))).head().getDouble(0)
    val tgAcc = joined.filter(col("id").isInCollection(IrisData.maskedIds(n, 2)))
      .select(avg(when(col("tg") === col("target"), 1.0).otherwise(0.0))).head().getDouble(0)
    println(f"sepal_length imputation RMSE: $slRmse%.3f")
    println(f"petal_length imputation RMSE: $plRmse%.3f")
    println(f"target imputation accuracy:   $tgAcc%.3f")
    spark.stop()
  }
}
