package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Symmetric per-vector int8 quantization for embedding columns: at
 * 100 TB an `ARRAY<FLOAT>` embedding column is often the single largest
 * surface, and int8 cuts it 4× while cosine similarity survives almost
 * unchanged — the per-vector scale cancels in cos(q(a), q(b)), so
 * quantized arrays feed [[graft.functions.CosineSimilarity]] directly
 * (the native vector math accepts every fixed-width numeric array).
 *
 * Quantization grid: `q_i = floor(x_i · 127/max|x| + 0.5)` — the same
 * explicit floor-rounding used everywhere the DuckDB oracle must
 * reproduce float arithmetic exactly (round() half-even vs half-up
 * varies by engine; floor(x+0.5) does not). A zero vector — or one
 * whose max |x| is below 1e-300, where 127/mx would overflow to
 * +Infinity — quantizes to all zeros with scale 0.
 *
 * The quantizer itself is the native codegen'd
 * [[graft.functions.QuantizeInt8]] expression — O(d) per vector, inside
 * whole-stage codegen, no HOF lambdas on this hot path.
 */
object Quantize {

  // bare Column helper: registers on the thread's active session (the
  // same pattern as Similarity's dot/norm/cosine helpers)
  private def reg(): Unit = graft.Graft.register(SparkSession.active)

  /** `struct(q: ARRAY<TINYINT>, scale: DOUBLE)`; dequantize with
    * `x_i ≈ q_i / scale`. */
  def quantizeInt8(vec: Column): Column = {
    reg()
    call_function("quantize_int8", vec)
  }

  /** Approximate original values back from a quantized struct.
    * (Interpreted HOF by design: dequantize is a diagnostic/round-trip
    * surface, not a scoring hot path — similarity kernels consume the
    * int8 arrays directly.) */
  def dequantize(quantized: Column): Column =
    when(quantized.getField("scale") > 0,
      transform(quantized.getField("q"), q => q.cast("double") / quantized.getField("scale")))
      .otherwise(transform(quantized.getField("q"), q => lit(0.0)))
}
