package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source formats beyond parquet (the reference ingests CSV with header
  * auto-detect, main.cpp:52-59): CSV and JSON round-trip into the
  * cofactor pipeline. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("CSV with header + inferred schema feeds the cofactor aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Seq((1.0, 2.0, 3), (4.0, 5.0, 3), (7.0, 8.0, 4))
      .toDF("x", "y", "c")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val df = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    val t = Graft.cofactor(df, Seq("x", "y"), Seq("c"))
    assert(t.n == 3 && t.lin.toSeq == Seq(12.0, 15.0))
    assert(t.linCat.toSeq == Seq(Map(3 -> 2.0, 4 -> 1.0)))
  }

  test("partitioned parquet: a cofactor over a filtered scan prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Seq.tabulate(300)(i => (i % 3 match { case 0 => "a"; case 1 => "b"; case _ => "c" },
        i.toDouble, i % 5))
      .toDF("part_key", "x", "c")
      .write.mode("overwrite").partitionBy("part_key").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("part_key") === "b")
    // the partition filter must reach the scan, not run as a post-filter:
    // assert part_key appears INSIDE the PartitionFilters bracket (the
    // scan prints "PartitionFilters: []" even when nothing is pushed)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "PartitionFilters: \\[[^\\]]*part_key".r.findFirstIn(plan).isDefined
    assert(pushed, s"partition filter not pushed:\n$plan")
    val t = Graft.cofactor(df, Seq("x"), Seq("c"))
    assert(t.n == 100)
    assert(t.lin(0) == (1 until 300 by 3).map(_.toDouble).sum)
  }

  test("JSON source feeds the pipeline operators") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "unrelated text entirely"))
      .toDF("doc_id", "text").write.mode("overwrite").json(dir)
    val df = spark.read.json(dir)
    val kept = graft.operators.Dedup.exactText(df, col("text"), col("doc_id"))
    assert(kept.count() == 2)
  }
}
