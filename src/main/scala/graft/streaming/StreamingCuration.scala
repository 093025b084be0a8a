package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming training-data curation: the batch pipeline operators
 * (quality scoring, language ID, fingerprint dedup) applied to a
 * document stream. Everything stateless rides whole-stage codegen; the
 * only stateful operator is the exact-dedup, which uses
 * `dropDuplicatesWithinWatermark` so the fingerprint state store is
 * bounded by the watermark horizon instead of growing forever — the
 * requirement for an always-on ingest at scale.
 */
object StreamingCuration {

  /**
   * Curate a streaming document source: score quality, tag language,
   * drop documents below `minQuality`, and keep one document per content
   * fingerprint within the watermark horizon.
   *
   * @param docs      streaming DataFrame with an event-time column
   * @param tsCol     event-time column name
   * @param watermark watermark duration (bounds dedup state)
   * @param textCol   document text column name
   */
  def curate(docs: DataFrame, tsCol: String, watermark: String, textCol: String,
             minQuality: Double = 0.1): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn("lang", TextFunctions.langId(col(textCol)))
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
