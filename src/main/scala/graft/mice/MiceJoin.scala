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
   * The 1-dim special case of [[imputeContOverStar]] (delegates; same
   * adaptive routing, same fallback contract).
   */
  def imputeContOverJoin(fact: DataFrame, dim: DataFrame, key: String,
                         target: String, factNum: Seq[String], dimNum: Seq[String],
                         lambda: Double = 0.0, stochastic: Boolean = false,
                         seed: Long = 42L,
                         tm: Mice.Timings = new Mice.Timings): DataFrame =
    imputeContOverStar(fact, Seq(Factorized.StarDim(dim, key, dimNum, Seq())),
      target, factNum, lambda, stochastic, seed, tm = tm)

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
   * fact rows. A missing-stratum row with no match in SOME dim, or with
   * any NULL dim feature, falls back to the observed-target mean — the
   * fallback is an EXPLICIT null-feature test, not an accident of NULL
   * propagation: a numeric NULL does null the prediction, but a
   * categorical NULL would one-hot to a silent all-zero block
   * (LinReg.predict's unseen-category coalesce), a configuration the
   * model never trained on.
   */
  def imputeContOverStar(fact: DataFrame, dims: Seq[Factorized.StarDim],
                         target: String, factNum: Seq[String],
                         lambda: Double = 0.0, stochastic: Boolean = false,
                         seed: Long = 42L, minRowsPerKey: Double = 4.0,
                         tm: Mice.Timings = new Mice.Timings): DataFrame = {
    val spark = fact.sparkSession
    Graft.register(spark)
    require(!factNum.contains(target),
      s"'$target' must not also appear in factNum — the model would fit " +
        "target ~ target and every missing row would silently get the mean " +
        "(the chained API's convention is the opposite: imputeCont ⊆ factNum)")
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
    // a NARROW fact keeps both strata on the live scan: the filters
    // re-read one columnar scan apiece, and the scan's bucketed layout
    // survives into the training groupBy(key) and the missing ⋈ dim
    // update join (zero-exchange when fact and dims share the bucket
    // key) — a checkpoint here erases bucket metadata and re-shuffles
    // both joins (see imputeChainedOverStar)
    val narrow = Graft.isNarrowPlan(fact)
    val (observed, missing) = tm.time("partition") {
      if (narrow) (fact.filter(col(target).isNotNull), fact.filter(col(target).isNull))
      else (fact.filter(col(target).isNotNull).transform(Graft.checkpoint),
            fact.filter(col(target).isNull).transform(Graft.checkpoint))
    }
    val triple = tm.time("cofactor_static")(Factorized.cofactorOverStar(
      observed, target +: factNum, Seq(), dims, minRowsPerKey))
    val model = tm.time("train")(LinReg.train(triple, label = 0, lambda,
      normalize = true))
    val mean = if (triple.n == 0) 0.0 else triple.lin(0) / triple.n
    val imputed = tm.time("impute_update") {
      val pred = LinReg.predict(model, (factNum ++ dimNum).map(col), dimCat.map(col),
        addNoise = stochastic, seed = seed)
      dims.foldLeft(missing)((acc, d) => acc.join(d.df, Seq(d.key), "left"))
        .withColumn(target,
          when(anyDimFeatureNull(dimCols), lit(mean))
            .otherwise(coalesce(pred, lit(mean))))
        .select(outCols.map(col): _*)
    }
    // the result is consumed once by the caller — no checkpoint; any
    // stratum blocks (wide-fact path) stay live inside the returned
    // plan and are released by the caller's traversal-based
    // dropCheckpoint
    observed.unionByName(imputed)
  }

  /** TRUE when any dim-contributed feature is NULL — the no-dim-match /
    * NULL-feature detector both drivers' documented fallbacks key on.
    * Must be explicit: NULL numeric features null the linear predictor,
    * but NULL CATEGORICAL features do not (LinReg one-hots them to a
    * zero block; Lda.predict tie-breaks all-NULL scores to the first
    * class) — without this test a no-match row would silently get a
    * prediction from a feature configuration training never saw. */
  private def anyDimFeatureNull(dimCols: Seq[String]) =
    dimCols.map(col(_).isNull).reduceOption(_ || _).getOrElse(lit(false))

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
   * the rows where that column was originally observed), with two
   * caveats: a missing-stratum row with no dim match (or a NULL dim
   * feature) keeps its current value — baseline never faces that case —
   * and the parity holds exactly at `normalize = false`, the baseline's
   * fixed setting (the default `normalize = true` standardizes in
   * moment space, a no-op for plain well-conditioned least squares but
   * a different optimum under `lambda`/`shrinkage` — keep it `true` for
   * wild-scale features unless baseline-exact output is the goal).
   * `MiceJoinSpec` pins the parity on a complete join and the fixed
   * point of the non-stochastic chain.
   *
   * `minRowsPerKey` is [[Factorized.cofactorOverStar]]'s routing
   * threshold for every per-column training aggregate: the adaptive
   * default materializes the star for near-unique dims (where chaining
   * per-~1-row triples would cost more than it saves); pin 0.0 for the
   * always-factorized chain or `Double.MaxValue` for the always-fused
   * fallback, exactly as on [[imputeContOverStar]].
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
      stochastic: Boolean = false, seed: Long = 42L,
      minRowsPerKey: Double = 4.0)

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
   * aggregate is [[Factorized.cofactorOverStar]] — the chained ring
   * product when the adaptive probe (or a `cfg.minRowsPerKey` pin)
   * routes dims factorized, its size-guarded fused fallback for
   * near-unique dims; each row-level
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
    // A NARROW fact plan (scan/checkpoint leaf + projections/filters
    // only — no joins, aggregates, windows) stays UN-materialized: each
    // re-read is one cheap columnar scan, and — decisively at scale —
    // the scan's bucketed layout survives into the per-column work, so
    // the training aggregate's groupBy(key) and the missing-stratum ⋈
    // dim update join run ZERO-EXCHANGE on co-located tables. A
    // checkpoint here would trade three cheap scans for a 600M-row
    // materialization AND re-shuffle both sides of every downstream
    // join (LogicalRDD has no bucket metadata) — measured 277 s → 87 s
    // on the sf100 star round. Wide fact plans keep the checkpoint:
    // re-executing an upstream join per re-read is the worse deal.
    // Mice.prepare is recompute-safe — its mean/mode aggregate runs
    // once eagerly and lands in the plan as literals.
    val prepared = tm.time("prepare")(Mice.prepare(fact, miceCfg))
    val base =
      if (Graft.isNarrowPlan(fact)) prepared
      else tm.time("prepare")(prepared.transform(Graft.checkpoint))
    val outCols = base.columns.toSeq
    val numAll = cfg.factNum ++ dimNumAll
    val catAll = cfg.factCat ++ dimCatAll
    val order = cfg.imputeCat ++ cfg.imputeCont // categorical first, the baseline order

    // The generation lives as DISJOINT BRANCHES whose union is the
    // current completed dataset, instead of one frame re-materialized
    // whole per column step. The round-15 sf100 measurement that forced
    // this: at 3 iterations the old whole-generation checkpoint cost
    // 212 s of 600M-row materializations per run (the observed ~86%
    // never changed that step) and the checkpointed UNION carried no
    // partitioning, so every post-round-1 training aggregate re-paid a
    // full exchange the bucketed layout had made free (cofactor 5.3 →
    // 65 s). Branches fix both at once:
    //  - only each step's UPDATED stratum (the missing fraction) is
    //    checkpointed, layout-preserved per SOURCE branch — the
    //    missing ⋈ dim join output is co-partitioned on the key, and
    //    Graft.checkpoint keeps that, so next iteration's update join
    //    is again zero-exchange;
    //  - the observed remainder of every branch stays a LAZY filter
    //    over its own cheap leaf (the bucketed scan or an existing
    //    checkpoint), so the training cofactor runs per branch on
    //    well-partitioned inputs and the triples RING-ADD (disjoint
    //    row sets — Triple.add is exactly the union of row sets).
    // Flag-derived pruning keeps the branch count at ~k+1 for k imputed
    // columns: `allFlag` marks columns every row of the branch has
    // flagged (an updated stratum for c is all-flag_c by construction —
    // its observed part for c is EMPTY, skip without a scan), `noFlag`
    // the columns no row has flagged (an observed remainder — its
    // missing part for c is empty likewise). Flags are immutable
    // (originally-missing markers), so the sets are exact, not
    // heuristic. A pathological multi-column chain could still fragment
    // the generation; past 12 branches the step coalesces back to one
    // whole-generation checkpoint — the old behavior as safety valve.
    final case class Gen(df: DataFrame, allFlag: Set[String], noFlag: Set[String],
                         isCkpt: Boolean)
    var branches: Seq[Gen] = Seq(Gen(base, Set.empty, Set.empty, isCkpt = !Graft.isNarrowPlan(fact)))
    // Run-scoped training-triple memo, keyed by the observed part's
    // CANONICALIZED plan: branch data is immutable within the run (the
    // base scan, materialized checkpoints), so a plan-identical observed
    // part across iterations carries the identical triple — for a
    // single imputed column the whole observed stratum is loop-invariant
    // and iterations 2..n retrain for free; for k columns every base-
    // branch stratum repeats per iteration likewise. Scoped to this
    // call: no global cache, no staleness surface beyond the in-run
    // file-rewrite case every memoized probe already documents.
    val tripleMemo = scala.collection.mutable.HashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, graft.ring.Triple]()

    for (iter <- 1 to cfg.iterations) {
      for (c <- order) {
        val fl = Mice.flag(c)
        // the training cofactor sees the WHOLE star through chained
        // per-key triples (block layout [factNum ++ dim1.num ++ …,
        // factCat ++ dim1.cat ++ …] — exactly Mice.baseline's column
        // order on the materialized star join); summed over branches
        val observedParts: Seq[DataFrame] = branches.flatMap { b =>
          if (b.allFlag.contains(c)) None
          else if (b.noFlag.contains(c)) Some(b.df)
          else Some(b.df.filter(!col(fl)))
        }
        val triple = tm.time("cofactor") {
          observedParts
            .map(p => tripleMemo.getOrElseUpdate(
              p.queryExecution.analyzed.canonicalized,
              Factorized.cofactorOverStar(p, cfg.factNum, cfg.factCat,
                dims, cfg.minRowsPerKey)))
            .reduceOption(graft.ring.Triple.add)
            .getOrElse(graft.ring.Triple.zero(numAll.size, catAll.size))
        }
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
        // match in some dim (or a NULL dim feature) keeps its value —
        // explicitly tested (anyDimFeatureNull), because only numeric
        // NULLs propagate into a NULL pred; categorical NULLs would
        // otherwise yield a silently-biased prediction (LinReg's zero
        // one-hot block / Lda's first-class tiebreak over NULL scores)
        def updatePart(part: DataFrame): DataFrame =
          dims.foldLeft(part)((acc, d) => acc.join(d.df, Seq(d.key), "left"))
            .withColumn(c,
              when(anyDimFeatureNull(dimCols), col(c))
                .otherwise(coalesce(pred, col(c))))
            .select(outCols.map(col): _*)
        // The FINAL step has no next step to shield: its updated parts
        // are returned un-materialized (the caller's single consumption
        // pays the one pass a checkpoint would have pre-paid), and
        // surviving checkpoint blocks stay live inside the returned
        // plan — Graft.dropCheckpoint(result) releases them by
        // traversal. Non-final steps checkpoint each updated part
        // (EAGER inside Graft.checkpoint) so the next step's filters
        // and training cofactor never re-execute this step's join, and
        // a branch fully consumed by this step frees its blocks
        // deterministically once its replacement is materialized.
        val isFinal = iter == cfg.iterations && c == order.last
        val next = tm.time("impute_update") {
          val remainders = branches.flatMap { b =>
            if (b.allFlag.contains(c)) None // fully consumed below
            else if (b.noFlag.contains(c)) Some(b) // untouched: no flagged rows
            else Some(Gen(b.df.filter(!col(fl)), b.allFlag, b.noFlag + c, b.isCkpt))
          }
          val updatedParts = branches.flatMap { b =>
            if (b.noFlag.contains(c)) None
            else {
              val part = if (b.allFlag.contains(c)) b.df else b.df.filter(col(fl))
              val upd = updatePart(part)
              Some(Gen(if (isFinal) upd else upd.transform(Graft.checkpoint),
                b.allFlag + c, b.noFlag, isCkpt = !isFinal))
            }
          }
          // free branches this step consumed whole (their replacement
          // checkpoints are already materialized — Graft.checkpoint is
          // eager); split branches keep their blocks referenced by the
          // observed remainder and drain over subsequent steps. At the
          // FINAL step the replacement is intentionally NOT
          // checkpointed, so the consumed branch's blocks are still the
          // only materialized form of its update-join chain — they must
          // stay live inside the returned lazy plan (the caller's
          // traversal-based Graft.dropCheckpoint releases them), else
          // the caller's single consumption recomputes the chain
          // through every previously dropped generation
          branches.foreach { b =>
            if (!isFinal && b.isCkpt && b.allFlag.contains(c)) Mice.dropCheckpoint(b.df)
          }
          remainders ++ updatedParts
        }
        branches =
          if (next.size <= 12 || isFinal) next
          else {
            // safety valve: re-coalesce a fragmented generation to one
            // whole checkpoint (the pre-branch behavior)
            val whole = tm.time("impute_update")(
              next.map(_.df).reduce(_.unionByName(_)).transform(Graft.checkpoint))
            next.foreach(b => if (b.isCkpt) Mice.dropCheckpoint(b.df))
            Seq(Gen(whole, Set.empty, Set.empty, isCkpt = true))
          }
      }
    }
    branches.map(_.df).reduce(_.unionByName(_))
      .drop((cfg.imputeCont ++ cfg.imputeCat).map(Mice.flag): _*)
  }

  /** Fail loudly on a duplicated dim key (see the contract above): one
    * hash-agg + limit-1 probe, map-side combined, dim-sized. Shared with
    * every operator that left-joins a must-be-unique side (e.g.
    * [[graft.operators.Multimodal.withTranscodeFallback]]).
    *
    * A PASSING verdict is memoized on (canonicalized plan, key,
    * file-snapshot fingerprint) — the same discipline (and the same
    * documented byte-identical-in-place-rewrite aliasing caveat) as
    * [[graft.ml.Factorized.probeRowsPerKey]]'s cache, cleared by the
    * same [[graft.ml.Factorized.clearProbeCache]]. Measured r21: the
    * probe was a near-unique-key hash aggregate over the WHOLE dim per
    * call — 1.85 s of the 4.1 s sf10_mice_star_round pass, re-verifying
    * an immutable bucketed table every round. Failures are never
    * cached (they throw). */
  private val uniqueKeyCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
      java.lang.Boolean](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
            java.lang.Boolean]): Boolean = size() > 256
    })
  private[graft] def clearUniqueKeyCache(): Unit = uniqueKeyCache.clear()
  private[graft] def requireUniqueKey(dim: DataFrame, key: String,
                                      caller: String = "MiceJoin"): Unit = {
    val ck = (dim.queryExecution.analyzed.canonicalized, "unique:" + key,
      Factorized.snapshotFingerprint(dim))
    if (uniqueKeyCache.get(ck) != null) return
    // NULL keys are excluded: an equi-join can never match them, so
    // multiple NULL-keyed rows cannot fan anything out — aborting on
    // them would reject valid input. The count is aliased so a key
    // column literally named "count" stays unambiguous.
    val dup = dim.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__graft_cnt"))
      .where(col("__graft_cnt") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"$caller requires the joined side unique per '$key'; found duplicated key ${dup.head.get(0)} " +
        "(pre-aggregate or dropDuplicates that side explicitly before calling)")
    uniqueKeyCache.put(ck, java.lang.Boolean.TRUE)
  }
}
