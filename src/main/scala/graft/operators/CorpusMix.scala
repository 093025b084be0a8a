package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic source-weighted corpus mixture composition — the "data
 * mixing" step of a training run: given a target weight per source
 * (expected epochs of that source in the final mix, e.g. curated
 * reference text ×3.0, raw web ×0.25), emit each document
 *
 *   copies(d) = floor(w)  +  [stableHash32(id) < frac(w) · 2^32]
 *
 * times, tagged with an `epoch` column (0-based). Epochs 0..floor(w)−1
 * are FULL copies; the one fractional epoch keeps the
 * [[StableSplit.stableSample]] subset, so the composition is
 * re-derivable bit-for-bit on any engine from the pinned
 * plain-arithmetic hash (the dataset card can state the mixture and
 * anyone can rebuild it), and growing a source's weight only ADDS
 * copies — never reshuffles which documents the smaller mix contained
 * (the subset-stability law q93 pins for flat sampling).
 *
 * 100 TB shape: ZERO shuffles — the weights ship as two literal maps
 * (floor-epochs and fractional thresholds), the epoch column is an
 * `explode(sequence(...))` whose length is the per-source epoch count
 * (bounded by max weight, a mixture policy constant), and the keep
 * rule is a pure codegen'd comparison. Sources absent from `weights`
 * drop (weight 0) — a mixture is an allowlist by construction.
 *
 * [[mixKey]] is the companion deterministic GLOBAL SHUFFLE key: a
 * training corpus must be randomly ordered but REPRODUCIBLY so;
 * ordering (or range-partitioning the write) by the stable hash of
 * (id, epoch) gives every engine the same pseudo-random permutation
 * with no `rand()` anywhere. The epoch folds in via a low-32-bit
 * multiply-xor so two copies of one document land far apart.
 */
object CorpusMix {

  /** Compose the mixture. `weights`: source value → expected epochs
    * (> 0; values above `maxWeight` fail loudly — a fat-finger 300.0
    * would explode the corpus 300×). Output = `docs`' columns +
    * `epoch INT`. Rows whose source is not in `weights` (or is NULL)
    * are dropped; a NULL `idCol` row keeps only its full epochs (the
    * fractional-keep rule needs a key — same NULL contract as
    * [[StableSplit.stableSample]], decided here as "not sampled"). */
  def compose(docs: DataFrame, sourceCol: String, idCol: String,
              weights: Map[String, Double], maxWeight: Double = 100.0): DataFrame = {
    require(weights.nonEmpty, "compose needs at least one source weight")
    require(weights.values.forall(_ > 0), "mixture weights must be positive")
    require(weights.values.forall(_ <= maxWeight),
      s"mixture weight above maxWeight=$maxWeight — raise maxWeight if the epoch count is intended")
    val M = 4294967296L // 2^32
    // sorted for a deterministic literal-map layout (plan strings,
    // canonicalization, and cache keys all see one canonical order)
    val ws = weights.toSeq.sortBy(_._1)
    val fullEpochs = ws.map { case (s, w) => (s, math.floor(w).toLong) }
    val fracThresh = ws.map { case (s, w) =>
      (s, math.round((w - math.floor(w)) * M.toDouble)) }
    def litMap(m: Seq[(String, Long)]): Column =
      map(m.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val full = element_at(litMap(fullEpochs), col(sourceCol))
    val thresh = element_at(litMap(fracThresh), col(sourceCol))
    // epoch 0..full INCLUSIVE: the last slot is the fractional epoch,
    // kept only when the stable hash clears the source's threshold
    // (an integral weight has threshold 0, which keeps nothing — hash
    // is never negative). element_at on an unlisted source is NULL,
    // which nulls the sequence and drops the row at the explode.
    docs
      .withColumn("__full", full)
      .withColumn("__epoch", explode(sequence(lit(0L), col("__full"))))
      .withColumn("epoch", col("__epoch").cast("int"))
      .filter(col("epoch") < col("__full") ||
        StableSplit.stableHash32(col(idCol)) < thresh)
      .drop("__full", "__epoch")
  }

  /** Per-source document cap — the "no more than N pages per domain"
    * curation rule (C4 caps extremely over-represented hosts; a mixture
    * policy caps any one crawl source from dominating the corpus).
    * Keeps, for every `sourceCol` value, the `cap` rows with the
    * SMALLEST `(stableHash32(id), id)` — a deterministic pseudo-random
    * survivor pick, engine-re-derivable from the same pinned hash the
    * split/sample/mixture family uses (no `rand()`, no first-N-in-file
    * bias toward whatever order the crawl was written in). Survivors
    * are subset-stable in `cap`: `cap=5` survivors ⊂ `cap=50`
    * survivors, so tightening a domain budget never rotates which
    * documents the smaller corpus contained.
    *
    * 100 TB shape: the rank is a bounded map-side k-heap per source
    * ([[graft.agg.TopKByScore]]) over a 3-column projection — each task
    * ships one O(cap) heap per source through the shuffle, NOT every
    * row — followed by one equi-join of the survivor ids back against
    * the corpus (survivors ≤ #sources · cap rows, which AQE broadcasts
    * in any realistic mixture). A window `row_number() OVER (PARTITION
    * BY source ORDER BY hash)` would shuffle AND sort the full corpus,
    * and a single mega-source (web crawl at 90% of rows) would sort
    * ~everything on one reducer; the heap form caps that reducer's
    * input at #tasks · cap entries.
    *
    * NULL-`idCol` rows are dropped (an id is a key — the same contract
    * as every top-k path); NULL `sourceCol` rows form their OWN group,
    * matching SQL's `PARTITION BY` null-bucketing, so an unattributed
    * stratum is capped too rather than passed through unbounded. */
  def capPerSource(docs: DataFrame, sourceCol: String, idCol: String,
                   cap: Int): DataFrame = {
    require(cap > 0, s"capPerSource needs a positive cap, got $cap")
    graft.Graft.register(docs.sparkSession)
    // smallest hash first under a DESC-ranked aggregate: negate. The
    // hash is < 2^32, exact in a double, so the negation is lossless.
    val survivors = docs
      .select(col(sourceCol).as("__src"), col(idCol).as("__id"))
      .withColumn("__score", -StableSplit.stableHash32(col("__id")).cast("double"))
      .groupBy(col("__src"))
      .agg(call_function("topk_by_score", col("__score"), col("__id"), lit(cap)).as("__top"))
      .select(explode(col("__top")).as("__e"))
      .select(col("__e").getField("cId").as("__keep_id"))
    docs.join(survivors, col(idCol) === col("__keep_id"), "left_semi")
  }

  /** The deterministic global-shuffle key for a composed mixture row:
    * `stableHash32(id XOR (epoch+1)·PRIME)` with the golden-ratio
    * 32-bit prime, so copies of one document from different epochs
    * scatter independently. Engine-portable: XOR, one small multiply
    * (epoch ≤ weight cap, so the product stays far below 2^63), and
    * the pinned hash. Order (or range-partition the sink) by this plus
    * a unique tiebreaker and every engine writes the same permutation. */
  def mixKey(id: Column, epoch: Column): Column =
    StableSplit.stableHash32(
      id.bitwiseXOR((epoch.cast("long") + lit(1L)) * lit(2654435761L)))
}
