package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The endpoint-scale vector corpus shared by the `sf100` bench tier
  * and [[BigAnnProbe]] — 3.2M × 64d, generated once into
  * `<dir>/embeddings_big.parquet`.
  *
  * Two-level structure, because flat clusters make ANN recall
  * meaningless at this size: with one level, every query's 12.5k
  * cell-mates sit at nearly the SAME distance (pure noise ranking),
  * which no code-based method — and no real system — can or should
  * resolve. Real embedding corpora have near-duplicate group
  * structure, so each vector belongs to a 16-member fine group (its
  * true neighbors: shared coarse center + shared fine offset, ±0.1
  * per-dim noise) inside one of 256 coarse cells. Amplitudes are sized
  * so the RANKING SIGNAL is resolvable but not trivial: coarse ±6
  * (Σc² ≈ 900 — dominates IVF cell geometry), fine ±4 (Σf² ≈ 340 —
  * sibling cos ≈ 1.0 vs same-cell-other-group ≈ 0.73, a gap an
  * m=16 ADC estimate can rank through, unlike a noise-only ±0.03 gap
  * no code-based method could resolve). Top-10 ⊂ the 15 siblings by
  * construction — exactly the semantic-dedup / near-dup retrieval
  * shape the vector family targets.
  */
object BigAnn {
  val N = 3200000L
  val Dim = 64
  val FineGroups = 200000L // 16 members per group
  val CoarseCells = 256L

  /** Read the corpus, generating it first if absent (deterministic
    * construction; ~850 MB parquet). */
  def ensureCorpus(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(dir, "embeddings_big.parquet")
    if (!path.exists()) {
      System.err.println("[bigann] generating the 3.2M-vector corpus (one-time)")
      val fine = col("id") % FineGroups
      val coarse = fine % CoarseCells
      val parts = (0 until Dim).map { j =>
        // xxhash64 per (group, dim), NOT a linear-congruential form: a
        // profile like (A·g + B·j) mod M is parameterized by ONE
        // residue, so distinct groups collapse into ~M near-identical
        // super-clusters (first attempt: 200k nominal groups, 1024
        // real ones — degenerate noise-ranked neighbors again)
        val coarseC = pmod(xxhash64(coarse, lit(j + 1000)), lit(13L))
          .cast("double") - 6.0
        val fineC = (pmod(xxhash64(fine, lit(j)), lit(1024L))
          .cast("double") / 512.0 - 1.0) * 4.0
        coarseC + fineC + (rand(42L * Dim + j) - 0.5) * 0.2
      }
      spark.range(N)
        .select(col("id").as("vec_id"),
          array(parts.map(_.cast("float")): _*).as("embedding"))
        .write.mode("overwrite").parquet(path.getAbsolutePath)
    }
    spark.read.parquet(path.getAbsolutePath)
  }
}
