package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic train/validation/test split assignment — the
 * reproducibility primitive a training-data pipeline needs: the same
 * row lands in the same split on every engine, every run, every
 * cluster size, forever. `rand()`-based sampling can't promise any of
 * that (reseeded per run, per partition layout), and engine-native
 * hashes (`xxhash64` here, `hash()` in DuckDB) differ across engines,
 * so a split written into a dataset card could never be re-derived
 * elsewhere.
 *
 * The hash is a 32-bit multiplicative mix (Knuth constant, then two
 * murmur-style xor-shift-multiply finalizer rounds) chosen because it
 * is EXPRESSIBLE IN PLAIN ARITHMETIC — multiply, mod, xor, shift — so
 * any engine reproduces it bit-for-bit (the q86 oracle recomputes it
 * in DuckDB via HUGEINT). All intermediates stay below 2^32; the two
 * long multiplications may wrap mod 2^64 on the Spark side, which is
 * harmless because 2^32 divides 2^64, so the mod-2^32 residue is
 * unaffected.
 *
 * Everything is a pure codegen'd `Column` (mul/pmod/xor/shift
 * built-ins): no shuffle, no UDF, scan-pushable — at 100 TB the split
 * costs exactly one projection.
 */
object StableSplit {

  private val M = 4294967296L // 2^32

  /** `a · k mod 2^32` for `a < 2^32`, `k < 2^32`, without the wrapping
    * 64-bit multiply (ANSI mode — Spark 4's default — throws on long
    * overflow): split `a` into 16-bit halves so every intermediate
    * stays below 2^48. `a·k = aLo·k + (aHi·k)·2^16`, and mod 2^32 the
    * high part only keeps `(aHi·k mod 2^16) · 2^16`. */
  private def mulMod32(a: Column, k: Long): Column = {
    val aHi = shiftrightunsigned(a, 16)
    val aLo = a.bitwiseAND(lit(0xFFFFL))
    pmod(aLo * lit(k) + pmod(aHi * lit(k), lit(65536L)) * lit(65536L), lit(M))
  }

  /** The engine-portable 32-bit hash of an integral key, as a Long
    * Column in [0, 2^32). Negative keys are folded by `pmod` first, so
    * the full long range is accepted. */
  def stableHash32(key: Column): Column = {
    val a = pmod(key.cast("long"), lit(M))
    // multiplicative step + two finalizer rounds, every residue < 2^32
    val h1 = mulMod32(a, 2654435761L) // Knuth's 2^32 / phi
    val x1 = h1.bitwiseXOR(shiftrightunsigned(h1, 16))
    val h2 = mulMod32(x1, 2246822519L) // xxhash PRIME32_2
    h2.bitwiseXOR(shiftrightunsigned(h2, 13))
  }

  /** Split-bucket assignment: `weights` are the split fractions (must
    * sum to 1 within 1e-9), the result is the bucket index 0..n-1 as
    * an INT Column. Thresholds are fixed integers (`round(cum · 2^32)`)
    * so the boundary is exact — no float comparison can move a row
    * between buckets across engines. A NULL key yields a NULL bucket
    * (the caller decides what an unkeyed row means; silently assigning
    * it to bucket 0 is never right). */
  def stableSplit(key: Column, weights: Seq[Double]): Column = {
    require(weights.size >= 2, "stableSplit needs at least two splits")
    require(weights.forall(_ > 0), "split weights must be positive")
    require(math.abs(weights.sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.sum}")
    val thresholds = weights.scanLeft(0.0)(_ + _).tail.dropRight(1)
      .map(c => math.round(c * M.toDouble))
    val h = stableHash32(key)
    val assigned = thresholds.zipWithIndex.foldRight(lit(weights.size - 1): Column) {
      // a NULL hash makes every `h < t` NULL, which would silently
      // fall through to the LAST bucket — guard explicitly instead
      case ((t, i), rest) => when(h < lit(t), lit(i)).otherwise(rest)
    }
    when(key.isNull, lit(null)).otherwise(assigned).cast("int")
  }

  /** Deterministic downsampling at a fixed `fraction`: keep a row iff
    * its [[stableHash32]] falls below `round(fraction · 2^32)` — the
    * same exact-integer threshold rule as [[stableSplit]], so the kept
    * set is re-derivable on any engine and STABLE UNDER `fraction`
    * growth (the 10% sample is a subset of the 20% sample — rerunning
    * a pipeline with a bigger budget only ADDS documents). NULL key →
    * NULL (caller decides). Returns a BOOLEAN Column. */
  def stableSample(key: Column, fraction: Double): Column = {
    require(fraction > 0 && fraction < 1,
      s"sampling fraction must be in (0, 1), got $fraction")
    when(key.isNull, lit(null))
      .otherwise(stableHash32(key) < lit(math.round(fraction * M.toDouble)))
  }

  /** Per-row-probability downsampling: keep a row iff
    * `hash/2^32 < weight` — quality-weighted corpus sampling (weight =
    * a quality score in [0, 1]; a 0.9-quality document keeps with p ≈
    * 0.9, junk with its junk score), deterministic per key and
    * engine-portable (the hash is < 2^32 so its double cast is exact,
    * and both sides evaluate `weight · 2^32` in IEEE doubles). Weights
    * ≤ 0 never keep, ≥ 1 always keep; NULL key or weight → NULL. */
  def stableSampleWeighted(key: Column, weight: Column): Column =
    when(key.isNull || weight.isNull, lit(null))
      .otherwise(stableHash32(key).cast("double") <
        weight.cast("double") * lit(M.toDouble))

  // --- Catalyst-native forms for the SQL registry -------------------
  // A Column round-trip through createOrReplaceTempFunction leaves an
  // unconvertible ColumnNode leaf in the plan (the Column API wrapper
  // is for the Dataset path), so the SQL surface builds the identical
  // tree from catalyst expressions directly. Every product stays below
  // 2^48 (the same 16-bit-halves trick), so ANSI mode never overflows.
  import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, BitwiseXor, Cast, CaseWhen, Expression, If, IsNull, LessThan, Literal, Multiply, Pmod, ShiftRightUnsigned}
  import org.apache.spark.sql.types.{IntegerType, LongType}

  private def mulMod32Expr(a: Expression, k: Long): Expression = {
    val aHi = ShiftRightUnsigned(a, Literal(16))
    val aLo = BitwiseAnd(a, Literal(0xFFFFL))
    Pmod(Add(Multiply(aLo, Literal(k)),
      Multiply(Pmod(Multiply(aHi, Literal(k)), Literal(65536L)), Literal(65536L))), Literal(M))
  }

  /** [[stableHash32]] as a catalyst Expression (the `stable_hash32`
    * SQL function). */
  def stableHash32Expr(key: Expression): Expression = {
    val a = Pmod(Cast(key, LongType), Literal(M))
    val h1 = mulMod32Expr(a, 2654435761L)
    val x1 = BitwiseXor(h1, ShiftRightUnsigned(h1, Literal(16)))
    val h2 = mulMod32Expr(x1, 2246822519L)
    BitwiseXor(h2, ShiftRightUnsigned(h2, Literal(13)))
  }

  /** [[stableSplit]] as a catalyst Expression (the `stable_split` SQL
    * function; same weight validation). */
  def stableSplitExpr(key: Expression, weights: Seq[Double]): Expression = {
    require(weights.size >= 2, "stableSplit needs at least two splits")
    require(weights.forall(_ > 0), "split weights must be positive")
    require(math.abs(weights.sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.sum}")
    val thresholds = weights.scanLeft(0.0)(_ + _).tail.dropRight(1)
      .map(c => math.round(c * M.toDouble))
    val h = stableHash32Expr(key)
    val assigned = CaseWhen(
      thresholds.zipWithIndex.map { case (t, i) =>
        (LessThan(h, Literal(t)), Literal(i)): (Expression, Expression)
      },
      Some(Literal(weights.size - 1)))
    If(IsNull(key), Literal(null, IntegerType), Cast(assigned, IntegerType))
  }
}
