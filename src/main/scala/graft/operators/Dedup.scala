package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for 100 TB-scale corpora. Every variant is a
 * single-shuffle (or shuffle + bounded self-join) DataFrame plan:
 *
 *  - exact: hash-groupBy on a content key, keep the smallest tiebreaker
 *  - MinHash + LSH: shingle → minhash signature → band buckets →
 *    candidate pairs within buckets only (never an all-pairs join)
 *  - SimHash: 64-bit fingerprint, banded by 16-bit chunks, verified by
 *    Hamming distance
 *  - n-gram Jaccard: exact verification predicate for candidate pairs
 */
object Dedup {

  /** Exact dedup on `keys`: one row per key (the one with the smallest
    * `tiebreaker`). Single hash shuffle; no sort of the full data. */
  def exact(df: DataFrame, keys: Seq[Column], tiebreaker: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(tiebreaker)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  def exact(df: DataFrame, key: Column, tiebreaker: Column): DataFrame =
    exact(df, Seq(key), tiebreaker)

  /** Exact text dedup via md5 of the raw text. */
  def exactText(df: DataFrame, text: Column, tiebreaker: Column): DataFrame =
    exact(df, md5(text), tiebreaker)

  /** MinHash signature: `numHashes` independent min-hashes over word
    * `shingleSize`-shingles, as an ARRAY<BIGINT> column. The signature
    * itself is a native single-pass expression
    * ([[graft.functions.MinHashSignature]]); only the shingle hashing is
    * Column-composed. */
  def minhashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column = {
    graft.Graft.register(org.apache.spark.sql.SparkSession.active)
    call_function("minhash_signature",
      TextFunctions.shingles(text, shingleSize), lit(numHashes))
  }

  /**
   * LSH candidate pairs: signatures split into `bands` bands; documents
   * sharing any band hash become a candidate pair. Plans as
   * explode(bands) → groupBy(bucket) → in-bucket pair generation, so
   * cost is Σ bucket² rather than n². Buckets larger than
   * `maxBucketSize` (degenerate content) are dropped with a log-visible
   * count rather than exploding quadratically.
   *
   * Returns (idA, idB) with idA < idB, distinct.
   */
  def lshCandidatePairs(df: DataFrame, id: Column, sig: Column,
                        bands: Int = 8, maxBucketSize: Int = 200): DataFrame = {
    val n = df.select(sig).schema.head.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
    require(n.elementType == org.apache.spark.sql.types.LongType, "signature must be ARRAY<BIGINT>")
    // one row per (doc, band); band hash covers the band's signature
    // slice in deterministic position order
    val withBands = df.select(id.as("__id"), sig.as("__sig"))
      .select(col("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",",
            transform(slice(col("__sig"), b * (size(col("__sig")) / bands) + 1,
              size(col("__sig")) / bands), h => h.cast("string")))))).as(Seq("__band", "__bucket")))
    val buckets = withBands.groupBy("__band", "__bucket")
      .agg(collect_list("__id").as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucketSize))
    buckets.select(explode(pairCombinations(col("__ids"))).as("__p"))
      .select(col("__p")(0).as("idA"), col("__p")(1).as("idB"))
      .distinct()
  }

  /** All unordered pairs from an array (a < b by array order after sort). */
  private def pairCombinations(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sequence(lit(0), size(sorted) - 2), i =>
      transform(slice(sorted, i + 2, size(sorted)), b => array(sorted(i), b))))
  }

  /**
   * Near-duplicate pairs by MinHash/LSH, verified with exact n-gram
   * Jaccard ≥ `threshold` on the joined texts. `df` must have unique
   * ids. Returns (idA, idB, jaccard).
   */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.8, numHashes: Int = 64,
                         bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    val sig = df.select(col(idCol), col(textCol))
      .withColumn("__sig", minhashSignature(col(textCol), numHashes, shingleSize))
    val cands = lshCandidatePairs(sig, col(idCol), col("__sig"), bands)
    val a = df.select(col(idCol).as("idA"), col(textCol).as("__ta"))
    val b = df.select(col(idCol).as("idB"), col(textCol).as("__tb"))
    cands.join(a, "idA").join(b, "idB")
      .withColumn("jaccard", TextFunctions.ngramJaccard(col("__ta"), col("__tb"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** Near-dedup: drop every row that appears as the larger id of a
    * verified near-duplicate pair (keeps the canonical smallest id per
    * directly-connected duplicate set). */
  def dedupNear(df: DataFrame, idCol: String, textCol: String,
                threshold: Double = 0.8): DataFrame = {
    val drops = nearDuplicatePairs(df, idCol, textCol, threshold)
      .select(col("idB").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** SimHash near-duplicate pairs: fingerprints banded into four 16-bit
    * chunks (two fingerprints within Hamming distance ≤ `maxDist` ≤ 3
    * must agree on at least one chunk), verified by bit_count(xor). */
  def simhashPairs(df: DataFrame, id: Column, text: Column, maxDist: Int = 3): DataFrame = {
    graft.Graft.register(df.sparkSession)
    val fp = df.select(id.as("__id"),
      graft.functions.SimHash64.simhash64(TextFunctions.tokens(lower(text))).as("__fp"))
    val chunked = fp.select(col("__id"), col("__fp"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), shiftrightunsigned(col("__fp"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))): _*)).as("__chunk"))
    val a = chunked.select(col("__id").as("idA"), col("__fp").as("__fpA"), col("__chunk"))
    val b = chunked.select(col("__id").as("idB"), col("__fp").as("__fpB"), col("__chunk"))
    a.join(b, a("__chunk") === b("__chunk") && col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("__fpA").bitwiseXOR(col("__fpB"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }
}
