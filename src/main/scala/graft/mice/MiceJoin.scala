package graft.mice

import graft.Graft
import graft.ml.{Factorized, LinReg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MICE over a multi-table join — the reference paper's Flight-style
 * workload (factorized_imputation_flight.h:6-8: impute a fact-table
 * column using features that live in a DIMENSION table), composed from
 * the library's own pieces:
 *
 *  - training: [[Factorized.cofactorOverJoinAdaptive]] — the cofactor
 *    triple of `fact ⋈ dim` from per-key pre-aggregates and the ring
 *    product when keys repeat (README.md:163-173's factorized-learning
 *    pattern, at MICE's service), falling back to the fused aggregate
 *    over the join when the key is near-unique and factorization would
 *    shuffle more triples than rows;
 *  - partitioning: the [[Mice.partitioned]] delta discipline — the
 *    observed stratum is aggregated once; only the (small) missing
 *    stratum is ever joined wide, because prediction needs per-row
 *    dimension features and the missing stratum is where predictions go.
 *
 * At 100 TB this is the shape that matters: the model sees the whole
 * join through KB-sized triples, and the row-level join touches
 * |missing| rows, not |fact|.
 */
object MiceJoin {

  /**
   * One factorized MICE round for a single continuous fact-side column:
   * train `target ~ factNum ++ dimNum` on the rows where `target` is
   * observed (cofactor computed factorized over the join), then impute
   * the missing stratum through a row-level join restricted to it.
   *
   * `dim` must carry the join key under the same name `key` as `fact`
   * (rename before calling), be projected to (key, dimNum…), and be
   * UNIQUE per key — a duplicated key would both multiply the cofactor's
   * per-key counts (training sees phantom join rows) and fan out the
   * missing stratum (more output rows than `fact`, with conflicting
   * imputed values per fact row). This is asserted up front with one
   * aggregate probe over `dim` (dimension-table sized, not fact-sized)
   * rather than silently `dropDuplicates`-ed, which would impute from an
   * arbitrary surviving row. A missing-stratum row with no dim match (or
   * a NULL feature) falls back
   * to the observed-target mean — the imputation never leaves NULLs.
   * With a single imputed column the observed stratum never changes, so
   * one round IS the fixed point of non-stochastic MICE; chain calls for
   * multi-column chained equations.
   *
   * Returns `fact`'s columns with `target` imputed (no dim columns).
   */
  def imputeContOverJoin(fact: DataFrame, dim: DataFrame, key: String,
                         target: String, factNum: Seq[String], dimNum: Seq[String],
                         lambda: Double = 0.0, stochastic: Boolean = false,
                         seed: Long = 42L,
                         tm: Mice.Timings = new Mice.Timings): DataFrame = {
    val spark = fact.sparkSession
    Graft.register(spark)
    requireUniqueKey(dim, key)
    val outCols = fact.columns.toSeq
    val (observed, missing) = tm.time("partition")(
      (fact.filter(col(target).isNotNull).localCheckpoint(),
       fact.filter(col(target).isNull).localCheckpoint()))
    // the factorized static cofactor: [target, factNum…, dimNum…] —
    // per-key triples + ring product, the join never materialized
    val triple = tm.time("cofactor_static")(Factorized.cofactorOverJoinAdaptive(
      observed, dim, key, target +: factNum, Seq(), dimNum, Seq()))
    // normalize: dimension features often live on wild scales (an order
    // total is ~10⁴× a discount), and the raw moment matrix's condition
    // number then exceeds the pinv's relative singular-value cut — the
    // truncated directions silently zero the intercept. Standardizing in
    // moment space costs nothing (the triple is already collected) and
    // the coefficients fold back to raw scale.
    val model = tm.time("train")(LinReg.train(triple, label = 0, lambda,
      normalize = true))
    // mean of the observed target straight from the triple (lin(0)/N) —
    // the NULL-feature / no-dim-match fallback, no extra scan
    val mean = if (triple.n == 0) 0.0 else triple.lin(0) / triple.n
    val imputed = tm.time("impute_update") {
      val pred = LinReg.predict(model, (factNum ++ dimNum).map(col), Seq(),
        addNoise = stochastic, seed = seed)
      missing.join(dim, Seq(key), "left")
        .withColumn(target, coalesce(pred, lit(mean)))
        .select(outCols.map(col): _*)
        .localCheckpoint()
    }
    observed.unionByName(imputed)
  }

  /**
   * One factorized MICE round for a continuous fact-side column over a
   * MULTI-DIMENSION star join (the paper's Flight/Retailer shape —
   * factorized_imputation_flight.h:6-8: the fact column's features live
   * in SEVERAL dimension tables joined on distinct keys).
   * [[imputeContOverJoin]] generalized: training sees the whole star
   * through [[Factorized.cofactorOverStar]]'s chained ring products (the
   * wide join never materialized), and the row-level imputation join
   * touches only the missing stratum, left-joining each dim in turn.
   * Every dim must be unique per its key (asserted, dim-sized probes) —
   * required here even though training alone would tolerate
   * multiplicity, because the imputation left-joins must not fan out
   * fact rows. A missing-stratum row with no match in SOME dim (NULL
   * features ⇒ NULL prediction) falls back to the observed-target mean.
   */
  def imputeContOverStar(fact: DataFrame, dims: Seq[Factorized.StarDim],
                         target: String, factNum: Seq[String],
                         lambda: Double = 0.0, stochastic: Boolean = false,
                         seed: Long = 42L, minRowsPerKey: Double = 4.0,
                         tm: Mice.Timings = new Mice.Timings): DataFrame = {
    val spark = fact.sparkSession
    Graft.register(spark)
    dims.foreach(d => requireUniqueKey(d.df, d.key))
    val dimNum = dims.flatMap(_.num)
    // categorical dim features ride the same star cofactor (their
    // one-hot blocks live in the triple's cat slices) and enter the
    // regression exactly as in the chained driver — the predictor gets
    // them in declared dim order
    val dimCat = dims.flatMap(_.cat)
    val dimCols = dimNum ++ dimCat
    require(dimCols.intersect(fact.columns.toSeq).isEmpty,
      s"dim feature names must be disjoint from fact's: ${dimCols.intersect(fact.columns.toSeq)}")
    val outCols = fact.columns.toSeq
    val (observed, missing) = tm.time("partition")(
      (fact.filter(col(target).isNotNull).localCheckpoint(),
       fact.filter(col(target).isNull).localCheckpoint()))
    val triple = tm.time("cofactor_static")(Factorized.cofactorOverStar(
      observed, target +: factNum, Seq(), dims, minRowsPerKey))
    val model = tm.time("train")(LinReg.train(triple, label = 0, lambda,
      normalize = true))
    val mean = if (triple.n == 0) 0.0 else triple.lin(0) / triple.n
    val imputed = tm.time("impute_update") {
      val pred = LinReg.predict(model, (factNum ++ dimNum).map(col), dimCat.map(col),
        addNoise = stochastic, seed = seed)
      dims.foldLeft(missing)((acc, d) => acc.join(d.df, Seq(d.key), "left"))
        .withColumn(target, coalesce(pred, lit(mean)))
        .select(outCols.map(col): _*)
        .localCheckpoint()
    }
    observed.unionByName(imputed)
  }

  /**
   * Chained multi-column MICE over the join — [[Mice.baseline]]'s
   * columns × iterations loop with every training aggregate computed
   * FACTORIZED over fact ⋈ dim and every row-level update restricted to
   * the column's missing stratum (the paper's full Flight workload:
   * multiple fact-side columns, continuous AND categorical, imputed from
   * fact + dimension features the join never materializes for training).
   *
   * @param factNum  continuous fact columns (cast to double; superset of
   *                 `imputeCont`)
   * @param factCat  categorical fact columns (cast to int; superset of
   *                 `imputeCat`)
   * @param dimNum / dimCat  dimension-side features — names must be
   *                 disjoint from fact's (project/rename `dim` first);
   *                 `dim` unique per `key` (asserted, as above)
   * @param cfg      [[ChainConfig]]: which columns to impute, iteration
   *                 count, regularization, normalization (keep `true`
   *                 for wild-scale features — the q62 lesson)
   *
   * Semantics match [[Mice.baseline]] run on the MATERIALIZED join with
   * contCols = factNum ++ dimNum and catCols = factCat ++ dimCat
   * (categorical columns first, mean/mode init, per-column retrain on
   * the rows where that column was originally observed), with one
   * extension: a missing-stratum row with no dim match keeps its current
   * value (baseline never faces that case). `MiceJoinSpec` pins the
   * parity on a complete join and the fixed point of the non-stochastic
   * chain.
   *
   * Returns `fact`'s columns with the imputed values in place.
   */
  final case class ChainConfig(
      factNum: Seq[String], factCat: Seq[String],
      dimNum: Seq[String], dimCat: Seq[String] = Seq(),
      imputeCont: Seq[String] = Seq(), imputeCat: Seq[String] = Seq(),
      iterations: Int = 5,
      lambda: Double = 0.0, shrinkage: Double = 0.0,
      normalize: Boolean = true,
      stochastic: Boolean = false, seed: Long = 42L)

  def imputeChainedOverJoin(fact: DataFrame, dim: DataFrame, key: String,
                            cfg: ChainConfig,
                            tm: Mice.Timings = new Mice.Timings): DataFrame =
    imputeChainedOverStar(fact,
      Seq(Factorized.StarDim(dim, key, cfg.dimNum, cfg.dimCat)),
      cfg.copy(dimNum = Seq(), dimCat = Seq()), tm)

  /**
   * [[imputeChainedOverJoin]] over a MULTI-DIMENSION star — the paper's
   * full Flight/Retailer workload (multiple imputed fact columns,
   * continuous AND categorical, with features spread across SEVERAL
   * dimension tables joined on distinct keys). Each per-column training
   * aggregate is [[Factorized.cofactorOverStar]]'s chained ring product
   * (the wide star never materialized for training); each row-level
   * update left-joins every dim, restricted to the column's missing
   * stratum. Dim features come from the [[Factorized.StarDim]]s —
   * `cfg.dimNum`/`cfg.dimCat` must be empty in this overload. Semantics
   * ≡ [[Mice.baseline]] on the materialized star join with
   * contCols = factNum ++ dims.flatMap(num) and
   * catCols = factCat ++ dims.flatMap(cat) (`MiceJoinSpec` pins it).
   */
  def imputeChainedOverStar(fact: DataFrame, dims: Seq[Factorized.StarDim],
                            cfg: ChainConfig,
                            tm: Mice.Timings = new Mice.Timings): DataFrame = {
    val spark = fact.sparkSession
    Graft.register(spark)
    require(cfg.dimNum.isEmpty && cfg.dimCat.isEmpty,
      "star chain: dim features are declared on each StarDim, not in ChainConfig")
    dims.foreach(d => requireUniqueKey(d.df, d.key))
    require(cfg.imputeCont.forall(cfg.factNum.contains) &&
      cfg.imputeCat.forall(cfg.factCat.contains),
      "imputed columns must be fact-side features (factNum/factCat)")
    val dimNumAll = dims.flatMap(_.num)
    val dimCatAll = dims.flatMap(_.cat)
    val dimCols = dimNumAll ++ dimCatAll
    require(dimCols.intersect(fact.columns.toSeq).isEmpty,
      s"dim feature names must be disjoint from fact's: ${dimCols.intersect(fact.columns.toSeq)}")
    require(dimCols.distinct.length == dimCols.length,
      "dim feature names must be pairwise disjoint across dims")
    val miceCfg = Mice.Config(
      contCols = cfg.factNum, catCols = cfg.factCat,
      imputeCont = cfg.imputeCont, imputeCat = cfg.imputeCat,
      iterations = cfg.iterations, lambda = cfg.lambda, shrinkage = cfg.shrinkage,
      stochastic = cfg.stochastic, seed = cfg.seed)
    var cur = tm.time("prepare")(Mice.prepare(fact, miceCfg).localCheckpoint())
    val outCols = cur.columns.toSeq
    val numAll = cfg.factNum ++ dimNumAll
    val catAll = cfg.factCat ++ dimCatAll
    val order = cfg.imputeCat ++ cfg.imputeCont // categorical first, the baseline order
    for (iter <- 1 to cfg.iterations) {
      for (c <- order) {
        val observed = cur.filter(!col(Mice.flag(c)))
        val missing = cur.filter(col(Mice.flag(c)))
        // the training cofactor sees the WHOLE star through chained
        // per-key triples (block layout [factNum ++ dim1.num ++ …,
        // factCat ++ dim1.cat ++ …] — exactly Mice.baseline's column
        // order on the materialized star join)
        val triple = tm.time("cofactor")(Factorized.cofactorOverStar(
          observed, cfg.factNum, cfg.factCat, dims))
        val isCont = cfg.imputeCont.contains(c)
        val pred = tm.time("train") {
          if (isCont) {
            val label = cfg.factNum.indexOf(c)
            val model = LinReg.train(triple, label, cfg.lambda, normalize = cfg.normalize)
            LinReg.predict(model,
              numAll.filterNot(_ == c).map(col), catAll.map(col),
              addNoise = cfg.stochastic, seed = cfg.seed + iter * 131 + label)
          } else {
            val label = cfg.factCat.indexOf(c)
            val model = graft.ml.Lda.train(triple, label, cfg.shrinkage,
              normalize = cfg.normalize)
            graft.ml.Lda.predict(model,
              numAll.map(col), catAll.filterNot(_ == c).map(col))
          }
        }
        // row-level work touches ONLY the missing stratum; a row with no
        // match in some dim (NULL features ⇒ NULL pred) keeps its value
        val updated = tm.time("impute_update") {
          dims.foldLeft(missing)((acc, d) => acc.join(d.df, Seq(d.key), "left"))
            .withColumn(c, coalesce(pred, col(c)))
            .select(outCols.map(col): _*)
        }
        cur = observed.unionByName(updated)
      }
      cur = tm.time("impute_update")(cur.localCheckpoint())
    }
    cur.drop((cfg.imputeCont ++ cfg.imputeCat).map(Mice.flag): _*)
  }

  /** Fail loudly on a duplicated dim key (see the contract above): one
    * hash-agg + limit-1 probe, map-side combined, dim-sized. Shared with
    * every operator that left-joins a must-be-unique side (e.g.
    * [[graft.operators.Multimodal.withTranscodeFallback]]). */
  private[graft] def requireUniqueKey(dim: DataFrame, key: String,
                                      caller: String = "MiceJoin"): Unit = {
    val dup = dim.groupBy(col(key)).count().where(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"$caller requires the joined side unique per '$key'; found duplicated key ${dup.head.get(0)} " +
        "(pre-aggregate or dropDuplicates that side explicitly before calling)")
  }
}
