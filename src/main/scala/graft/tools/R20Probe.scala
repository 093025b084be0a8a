package graft.tools

import graft.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 optimization probe: declarative cofactor rewrite (q09
  * factorized_join) and the fused MICE delta scans — plan capture,
  * result-equality check vs the default route, and isolated timings.
  * Temporary builder-side tool; numbers land in OPTIMIZATION_r20.md. */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.register(spark)
    Graft.enableSqlKernels(spark)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def med(label: String, reps: Int)(f: => Unit): Double = {
      f // warmup 1
      f // warmup 2
      val ts = (1 to reps).map(_ => time(f)._2).sorted
      val m = ts(ts.length / 2)
      println(f"[probe] $label: $m%.3f s  (all: ${ts.map(t => f"$t%.3f").mkString(",")})")
      m
    }
    def withoutRoutes(f: => Unit): Unit = {
      val s = spark.experimental.extraStrategies
      val o = spark.experimental.extraOptimizations
      spark.experimental.extraStrategies = Seq.empty
      spark.experimental.extraOptimizations = Seq.empty
      try f finally {
        spark.experimental.extraStrategies = s
        spark.experimental.extraOptimizations = o
      }
    }

    args.headOption.getOrElse("q09") match {
      case "q09" =>
        val q = graft.SparkEntry.queries("q09_factorized_join")(spark, dir)
        println("=== q09 AFTER (rewrite installed) plan ===")
        println(q.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        val after = q.collect().map(_.toString).toSeq
        var before: Seq[String] = null
        withoutRoutes {
          val q0 = graft.SparkEntry.queries("q09_factorized_join")(spark, dir)
          println("=== q09 BEFORE (default route) plan ===")
          println(q0.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          before = q0.collect().map(_.toString).toSeq
        }
        println(s"[probe] q09 result equal: ${before == after}")
        println(s"[probe] before=$before")
        println(s"[probe] after =$after")
        med("q09 routed", 5)(noop(graft.SparkEntry.queries("q09_factorized_join")(spark, dir)))
        med("q09 default", 5)(withoutRoutes(
          noop(graft.SparkEntry.queries("q09_factorized_join")(spark, dir))))
      case "mice" =>
        val li = graft.sources.Tables.load(spark, dir, "lineitem")
        def mice1(): Unit = {
          val base = li.select(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_linenumber"))
            .withColumn("l_discount",
              when(rand(7) < 0.15, lit(null)).otherwise(col("l_discount")))
          val cfg = graft.mice.Mice.Config(
            contCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
            catCols = Seq("l_linenumber"),
            imputeCont = Seq("l_discount"), imputeCat = Seq(), iterations = 1)
          val tm = new graft.mice.Mice.Timings
          val done = graft.mice.Mice.partitioned(base, cfg, tm)
          noop(done)
          graft.Graft.dropCheckpoint(done)
          System.err.println(s"[probe] mice phases: $tm")
        }
        med("mice_1round", 5)(mice1())
      case "dedup_lines" =>
        val corpus = graft.sources.Tables.load(spark, dir, "documents")
          .select(col("doc_id"),
            array_join(graft.functions.TextFunctions.chunkText(col("text"), 4, 0), "\n").as("text"))
        val q = graft.operators.Dedup.dedupLines(corpus, "doc_id", "text", 2L)
        println("=== dedup_lines plan ===")
        println(q.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        med("dedup_lines", 3)(noop(
          graft.operators.Dedup.dedupLines(corpus, "doc_id", "text", 2L)))
      case "mice_star" =>
        // not wired here: miceStarRound needs the bench's bucketed setup
        ()
      case "minhash" =>
        val docs = graft.sources.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
        val mangled = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
        val all = docs.unionByName(mangled)
        med("minhash_neardup", 5)(noop(
          graft.operators.Dedup.dedupNear(all, "doc_id", "text", threshold = 0.8)))
      case "masked" =>
        // cofactorMasked ≡ separate filtered scans, exactly
        val li = graft.sources.Tables.load(spark, dir, "lineitem")
          .withColumn("f1", col("l_orderkey") % 3 === 0)
          .withColumn("f2", col("l_partkey") % 2 === 0)
          .localCheckpoint()
        val num = Seq("l_quantity", "l_extendedprice")
        val cat = Seq("l_linenumber")
        val fused = Graft.cofactorMasked(li, num, cat,
          Seq(None, Some(col("f1")), Some(col("f2"))))
        val sep = Seq(
          Graft.cofactor(li, num, cat),
          Graft.cofactor(li.filter(col("f1")), num, cat),
          Graft.cofactor(li.filter(col("f2")), num, cat))
        fused.zip(sep).zipWithIndex.foreach { case ((a, b), i) =>
          val eq = a.n == b.n &&
            a.lin.sameElements(b.lin) && a.quad.sameElements(b.quad) &&
            a.linCat.sameElements(b.linCat)
          println(s"[probe] masked[$i] exact-equal: $eq  (n=${a.n} vs ${b.n})")
          if (!eq) {
            println(s"  lin a=${a.lin.mkString(",")} b=${b.lin.mkString(",")}")
            println(s"  quad a=${a.quad.mkString(",")} b=${b.quad.mkString(",")}")
          }
        }
        // nb mode too
        val fusedNb = Graft.cofactorMasked(li, num, cat,
          Seq(None, Some(col("f1"))), nb = true)
        val sepNb = Seq(Graft.cofactor(li, num, cat, nb = true),
          Graft.cofactor(li.filter(col("f1")), num, cat, nb = true))
        fusedNb.zip(sepNb).zipWithIndex.foreach { case ((a, b), i) =>
          val eq = a.n == b.n && a.lin.sameElements(b.lin) &&
            a.quad.sameElements(b.quad) && a.linCat.sameElements(b.linCat)
          println(s"[probe] maskedNb[$i] exact-equal: $eq")
        }
    }
    spark.stop()
  }
}
