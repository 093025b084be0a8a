package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's pure-SQL ML workflow, verbatim modulo dialect
  * (imputation_base.cpp:46-133): aggregate a triple, train via the SQL
  * function, splice the opaque params into the SQL predict over the
  * table. Predictions must equal the Scala API exactly (params are
  * doubles, so no precision gap). */
class MlSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val rng = new scala.util.Random(23)
  lazy val df = {
    val rows = Seq.tabulate(400) { i =>
      val cls = i % 3
      (rng.nextGaussian() + cls * 6.0, rng.nextGaussian() - cls * 4.0,
        if (rng.nextDouble() < 0.8) cls else rng.nextInt(3), cls)
    }
    val d = rows.toDF("f1", "f2", "cf", "cls").repartition(3)
    Graft.register(spark)
    d.createOrReplaceTempView("mlsql")
    d
  }

  test("lda_train/lda_predict SQL round-trip == Scala API") {
    df
    val sql = """
      SELECT cls, lda_predict(
        (SELECT lda_train(sum_to_triple(f1, f2, cf, cls), 1, 0.001D, false) FROM mlsql),
        false, f1, f2, cf) AS pred
      FROM mlsql"""
    val got = spark.sql(sql).collect().map(r => (r.getInt(0), r.getInt(1)))
    val t = Graft.cofactor(df, Seq("f1", "f2"), Seq("cf", "cls"))
    val m = graft.ml.Lda.train(t, label = 1, shrinkage = 0.001)
    val want = df.select($"cls", graft.ml.Lda.predict(m, Seq($"f1", $"f2"), Seq($"cf")).as("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    val acc = got.count(p => p._1 == p._2).toDouble / got.length
    assert(acc > 0.95, s"SQL LDA accuracy $acc")
  }

  test("linreg_train/linreg_predict SQL round-trip == Scala API") {
    df
    val sql = """
      SELECT f1, linreg_predict(
        (SELECT linreg_train(sum_to_triple(f1, f2, cf), 0, 0.001D, 0D, 10000, true, false)
         FROM mlsql),
        false, false, f2, cf) AS pred
      FROM mlsql"""
    val got = spark.sql(sql).collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val t = Graft.cofactor(df, Seq("f1", "f2"), Seq("cf"))
    val m = graft.ml.LinReg.train(t, label = 0)
    val want = df.select($"f1",
        graft.ml.LinReg.predict(m, Seq($"f2"), Seq($"cf")).as("p"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.sortBy(_._1).zip(want.sortBy(_._1)).forall { case ((a1, p1), (a2, p2)) =>
      a1 == a2 && math.abs(p1 - p2) < 1e-9
    })
  }

  test("qda_train/qda_predict and nb_train/nb_predict SQL round-trips") {
    df
    val qda = spark.sql("""
      SELECT cls, qda_predict(
        (SELECT qda_train(collect_list(t), collect_list(lbl), false) FROM
          (SELECT cls AS lbl, sum_to_triple(f1, f2, cf) AS t FROM mlsql GROUP BY cls)),
        false, f1, f2, cf) AS pred
      FROM mlsql""").collect().map(r => (r.getInt(0), r.getInt(1)))
    val accQ = qda.count(p => p._1 == p._2).toDouble / qda.length
    assert(accQ > 0.95, s"SQL QDA accuracy $accQ")
    // parity vs Scala API
    val perClass = Graft.cofactorPerClass(df, Seq("f1", "f2"), Seq("cf"), label = "cls")
    val mq = graft.ml.Qda.train(perClass)
    val wantQ = df.select($"cls",
        graft.ml.Qda.predict(mq, Seq($"f1", $"f2"), Seq($"cf")).as("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(qda.sorted.toSeq == wantQ.sorted.toSeq)

    val nb = spark.sql("""
      SELECT cls, nb_predict(
        (SELECT nb_train(collect_list(t), collect_list(lbl)) FROM
          (SELECT cls AS lbl, sum_to_nb_agg(f1, f2, cf) AS t FROM mlsql GROUP BY cls)),
        false, f1, f2, cf) AS pred
      FROM mlsql""").collect().map(r => (r.getInt(0), r.getInt(1)))
    val accN = nb.count(p => p._1 == p._2).toDouble / nb.length
    assert(accN > 0.95, s"SQL NB accuracy $accN")
    val mn = graft.ml.NaiveBayes.train(
      Graft.cofactorPerClass(df, Seq("f1", "f2"), Seq("cf"), label = "cls", nb = true))
    val wantN = df.select($"cls",
        graft.ml.NaiveBayes.predict(mn, Seq($"f1", $"f2"), Seq($"cf")).as("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(nb.sorted.toSeq == wantN.sorted.toSeq)
  }

  test("SQL surface robustness: full-triple nb_train, bigint labels, guards") {
    df
    // nb_train fed FULL triples (sum_to_triple) must project them to the
    // diagonal NB form, and BIGINT labels must be read as such
    val nb = spark.sql("""
      SELECT cls, nb_predict(
        (SELECT nb_train(collect_list(t), collect_list(lbl)) FROM
          (SELECT CAST(cls AS BIGINT) AS lbl, sum_to_triple(f1, f2, cf) AS t
           FROM mlsql GROUP BY cls)),
        false, f1, f2, cf) AS pred
      FROM mlsql""").collect().map(r => (r.getInt(0), r.getInt(1)))
    val acc = nb.count(p => p._1 == p._2).toDouble / nb.length
    assert(acc > 0.95, s"full-triple nb_train accuracy $acc")

    // training on zero rows yields NULL params, not a garbage model
    assert(spark.sql("""
      SELECT lda_train(sum_to_triple(f1, f2, cf, cls), 1, 0.001D, false)
      FROM mlsql WHERE f1 > 1e9""").head.isNullAt(0))

    // feature-count mismatch fails fast with a clear message
    val e = intercept[Exception] {
      spark.sql("""
        SELECT lda_predict(
          (SELECT lda_train(sum_to_triple(f1, f2, cf, cls), 1, 0.001D, false) FROM mlsql),
          false, f1, cf) AS pred
        FROM mlsql""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("features")), s"unexpected error: $e")

    // wrong arity is an analysis-time error, not an executor crash
    val e2 = intercept[Exception] {
      spark.sql("SELECT lda_train(sum_to_triple(f1, f2, cf, cls), 1) FROM mlsql").collect()
    }
    assert(msgs(e2).exists(m => m.contains("argument")), s"unexpected error: $e2")

    // a STRING feature is rejected at ANALYSIS time, not a runtime CCE
    val e3 = intercept[Exception] {
      spark.sql("""
        SELECT lda_predict(
          (SELECT lda_train(sum_to_triple(f1, f2, cf, cls), 1, 0.001D, false) FROM mlsql),
          false, f1, CAST(f2 AS STRING)) AS pred
        FROM mlsql""").collect()
    }
    assert(msgs(e3).exists(m => m.contains("numeric")), s"unexpected error: $e3")

    // a NULL triple slot and duplicate labels fail loudly in per-class train
    val e4 = intercept[Exception] {
      spark.sql("""
        SELECT nb_train(array(IF(1 = 0, t, NULL)), array(0)) AS p FROM
          (SELECT sum_to_nb_agg(f1, f2, cf) AS t FROM mlsql)""").collect()
    }
    assert(msgs(e4).exists(m => m.contains("NULL")), s"unexpected error: $e4")
    val e5 = intercept[Exception] {
      spark.sql("""
        SELECT nb_train(array(t, t), array(0, 0)) AS p FROM
          (SELECT sum_to_nb_agg(f1, f2, cf) AS t FROM mlsql)""").collect()
    }
    assert(msgs(e5).exists(m => m.contains("duplicate")), s"unexpected error: $e5")
  }

  test("model codec round-trips every model type exactly") {
    val t = Graft.cofactor(df, Seq("f1", "f2"), Seq("cf", "cls"))
    val lda = graft.ml.Lda.train(t, label = 1, shrinkage = 0.01)
    val lda2 = graft.ml.ModelCodec.decodeLda(graft.ml.ModelCodec.encode(lda))
    assert(lda2.classes.toSeq == lda.classes.toSeq)
    assert(lda2.coef.map(_.toSeq).toSeq == lda.coef.map(_.toSeq).toSeq)
    assert(lda2.intercepts.toSeq == lda.intercepts.toSeq)
    assert(lda2.dict.cats.map(_.toSeq).toSeq == lda.dict.cats.map(_.toSeq).toSeq)

    val lin = graft.ml.LinReg.train(Graft.cofactor(df, Seq("f1", "f2"), Seq("cf")), 0)
    val lin2 = graft.ml.ModelCodec.decodeLinReg(graft.ml.ModelCodec.encode(lin))
    assert(lin2.intercept == lin.intercept && lin2.sigma2 == lin.sigma2)
    assert(lin2.numCoef.toSeq == lin.numCoef.toSeq && lin2.catCoef.toSeq == lin.catCoef.toSeq)

    val perClass = Graft.cofactorPerClass(df, Seq("f1", "f2"), Seq("cf"), label = "cls")
    val qda = graft.ml.Qda.train(perClass)
    val qda2 = graft.ml.ModelCodec.decodeQda(graft.ml.ModelCodec.encode(qda))
    assert(qda2.quad.map(_.toSeq).toSeq == qda.quad.map(_.toSeq).toSeq)
    assert(qda2.consts.toSeq == qda.consts.toSeq)

    val nb = graft.ml.NaiveBayes.train(
      Graft.cofactorPerClass(df, Seq("f1", "f2"), Seq("cf"), label = "cls", nb = true))
    val nb2 = graft.ml.ModelCodec.decodeNb(graft.ml.ModelCodec.encode(nb))
    assert(nb2.priors.toSeq == nb.priors.toSeq)
    assert(nb2.catFreq.map(_.toSeq).toSeq == nb.catFreq.map(_.toSeq).toSeq)
  }
}
