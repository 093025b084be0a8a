package graft.examples

import graft.Graft
import graft.ml.Lda
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end LDA over a real table — the Spark counterpart of the
 * reference's C++-API example (examples/example_lda.cpp): one cofactor
 * aggregation, driver-side train, distributed predict.
 *
 * Run: `sbt "runMain graft.examples.ExampleLda"`
 */
object ExampleLda {
  def main(args: Array[String]): Unit = {
    val spark = Graft.register(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    // predict the lineitem's line number from its numeric attributes
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_linenumber"))

    // 1. one pass: the cofactor triple (the only thing collected)
    val triple = Graft.cofactor(li,
      num = Seq("l_quantity", "l_extendedprice", "l_discount"),
      cat = Seq("l_linenumber"))

    // 2. driver-side training from the triple alone
    val model = Lda.train(triple, label = 0, shrinkage = 1e-4)
    println(s"classes: ${model.classes.mkString(", ")}")

    // 3. distributed prediction
    val scored = li.withColumn("pred",
      Lda.predict(model,
        Seq(col("l_quantity"), col("l_extendedprice"), col("l_discount")), Seq()))
    val acc = scored.select(avg(when(col("pred") === col("l_linenumber"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    println(f"train accuracy: $acc%.3f (7 classes, chance ≈ 0.143)")
    spark.stop()
  }
}
