package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, plus feature-extraction / resize / frame-sample
 * operators.
 *
 * The Spark-side machinery (schema, batched partition iteration,
 * deterministic output shape, partitioning) is real and tested; the
 * byte-level media decode is STUBBED with a deterministic
 * hash-derived transform, because media codecs are not available in
 * this environment. Swapping [[StubDecoder]] for a real codec (JNI
 * ffmpeg/libjpeg, or an Arrow-batched Python worker à la
 * `mapInPandas`) changes no plan shape.
 */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  trait Decoder extends Serializable {
    /** Decode a media payload into a fixed-dim float feature vector. */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decode: deterministic pseudo-features from a rolling hash of
    * the payload — stands in for a real image/audio decoder. */
  object StubDecoder extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L
        out(i % dim) += ((h >>> 40).toInt & 0xffff) / 65536.0f - 0.5f
        i += 1
      }
      out
    }
  }

  /**
   * Batched feature extraction via `mapPartitions` — the Scala analogue
   * of an Arrow-batched `mapInPandas` UDF: rows stream through in
   * partition-local batches, the decoder is invoked per payload, and the
   * output schema appends `features ARRAY<FLOAT>`. No shuffle is
   * introduced; partitioning of the input is preserved.
   */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int,
                      decoder: Decoder = StubDecoder,
                      outputCol: String = "features"): DataFrame = {
    val schema = df.schema.add(outputCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats = if (bytes == null) new Array[Float](dim) else decoder.features(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Deterministic stub "resize": re-derive a payload of `newSize` bytes
    * from the original (a real implementation decodes + re-encodes).
    * Pure Column expression over BINARY. */
  def resizeStub(bin: Column, newSize: Int): Column =
    substring(concat(bin, bin), 1, newSize)

  /** Frame sampling for "video" payloads: `n` evenly spaced fixed-size
    * byte windows as ARRAY<BINARY> (the batch shape a real frame
    * extractor would produce). */
  def frameSample(bin: Column, n: Int, frameSize: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      substring_index_safe(bin, i, n, frameSize))

  private def substring_index_safe(bin: Column, i: Column, n: Int, frameSize: Int): Column = {
    val stride = greatest((length(bin) - frameSize) / lit(math.max(n - 1, 1)), lit(1))
    substring(bin, (i * stride + 1).cast("int"), lit(frameSize))
  }
}
