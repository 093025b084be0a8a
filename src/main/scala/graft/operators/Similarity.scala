package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor / similarity search over an embedding
 * column (`ARRAY<FLOAT>`), pure Column math (zip_with + aggregate —
 * codegen'd, no UDFs):
 *
 *  - brute-force cosine top-k: broadcast the (smaller) query side
 *    against the corpus — exact baseline
 *  - LSH (random hyperplane signs) bucketing: the 100 TB path — the
 *    corpus is bucketed once, probes join only their bucket
 */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /**
   * Exact top-k by cosine: for each row of `queries`, the k most similar
   * rows of `corpus`. The query side is broadcast (callers pass the
   * smaller side as `queries`); the corpus streams once.
   * Returns (qId, cId, cos, rank).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qVec: String, cId: String, cVec: String,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qId).as("qId"), col(qVec).as("__qv"))
    val c = corpus.select(col(cId).as("cId"), col(cVec).as("__cv"))
    val joined = c.crossJoin(broadcast(q))
    val scored = (if (excludeSelf) joined.filter(col("qId") =!= col("cId")) else joined)
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("qId")).orderBy(col("cos").desc, col("cId"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qId"), col("cId"), col("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes (seeded), as a literal matrix. */
  private def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bucket of a vector under `nPlanes` seeded hyperplanes. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 8, seed: Long = 42L): Column = {
    val ps = planes(dim, nPlanes, seed)
    ps.zipWithIndex.map { case (p, i) =>
      when(dot(transform(vec, x => x.cast("double")), typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /**
   * ANN top-k via hyperplane LSH: bucket both sides, join on bucket,
   * rank within candidates. Recall < 1 (probes see only their own
   * bucket); increase recall by lowering `nPlanes` or unioning several
   * seeds. Candidate cost is Σ bucket_q · bucket_c instead of |q|·|c|.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qId: String, qVec: String, cId: String, cVec: String,
              k: Int, dim: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val q = queries.select(col(qId).as("qId"), col(qVec).as("__qv"))
      .withColumn("__bucket", lshBucket(col("__qv"), dim, nPlanes, seed))
    val c = corpus.select(col(cId).as("cId"), col(cVec).as("__cv"))
      .withColumn("__bucket", lshBucket(col("__cv"), dim, nPlanes, seed))
    val scored = c.join(q, "__bucket")
      .filter(col("qId") =!= col("cId"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("qId")).orderBy(col("cos").desc, col("cId"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qId"), col("cId"), col("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold among LSH-bucket
    * candidates (exact variant: pass nPlanes = 0 for a full self-join). */
  def embeddingNearDupPairs(df: DataFrame, id: String, vec: String, threshold: Double,
                            dim: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val base = df.select(col(id).as("idA"), col(vec).as("__va"))
    val other = df.select(col(id).as("idB"), col(vec).as("__vb"))
    val pairs =
      if (nPlanes <= 0) base.crossJoin(other)
      else {
        val a = base.withColumn("__bucket", lshBucket(col("__va"), dim, nPlanes, seed))
        val b = other.withColumn("__bucket", lshBucket(col("__vb"), dim, nPlanes, seed))
        a.join(b, "__bucket")
      }
    pairs.filter(col("idA") < col("idB"))
      .withColumn("cos", cosine(col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select(col("idA"), col("idB"), col("cos"))
  }
}
