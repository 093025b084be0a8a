package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 64-bit SimHash over a token array: each token votes ±1 on every bit of
 * its 64-bit hash; the result sets bits with positive tallies. Two
 * near-identical documents differ in few bits (small Hamming distance),
 * so near-duplicate candidates can be bucketed by 16-bit bands.
 *
 * Native Catalyst expression (single pass, primitive arrays) rather than
 * a Scala UDF: no row-level serialization, null-safe, usable from SQL.
 */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got $dt")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
  override def prettyName: String = "simhash64"
}

/**
 * MinHash signature over an array of shingle hashes: for each of
 * `numHashes` seeded hash functions, the minimum remixed hash across the
 * shingles — one tight pass, no per-element array allocation (the pure
 * Column formulation allocates a 64-wide accumulator per shingle and
 * dominates dedup cost). Null/empty input yields the all-MaxValue
 * signature (matches "no shingles").
 */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects ARRAY<BIGINT> shingle hashes, got $dt")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          // splitmix64 remix of (shingle ^ golden-ratio seed k)
          var x = h ^ (0x9e3779b97f4a7c15L * (k + 1))
          x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
          x ^= x >>> 27; x *= 0x94d049bb133111ebL
          x ^= x >>> 31
          if (x < sig(k)) sig(k) = x
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object SimHash64 {
  /** Deterministic 64-bit string hash (FNV-1a over UTF-8 bytes, mixed). */
  private[functions] def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    // finalization mix (splitmix64) to decorrelate low bits
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Column helper (requires [[graft.Graft.register]]). */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
}
