package graft

import graft.operators.{MediaFixtures, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q118-q120 contract, locally: real BMP/WAV/MP4 payloads built from
  * the pinned formulas must decode back — through the REAL JDK paths —
  * to the formula-derived integer reductions the DuckDB oracle
  * restates. A failure here means writer, decoder, or reduction drifted
  * from the pinned arithmetic. */
class MediaOracleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = Seq(0L, 1L, 7L, 123L, 4567L)

  test("imageGridStats == pixel-formula reduction (BMP round trip)") {
    val df = MediaFixtures.withBmp(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.imageGridStats(df, "doc_id", "img", 3)
      .collect().map(r => ((r.getLong(0), r.getInt(4)),
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(5), r.getLong(6)))).toMap
    for (id <- ids) {
      val (w, h) = (MediaFixtures.imgW(id), MediaFixtures.imgH(id))
      val sums = new Array[Long](9)
      val counts = new Array[Long](9)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (id * 7 + x * 13 + y * 31) % 256
        val g = (id * 11 + x * 3 + y * 17) % 256
        val b = (id * 5 + x * 23 + y * 29) % 256
        val cell = (y * 3 / h) * 3 + (x * 3 / w)
        sums(cell) += r * 299 + g * 587 + b * 114
        counts(cell) += 1
      }
      for (c <- 0 until 9 if counts(c) > 0) {
        val (fmt, gw, gh, lum, np) = got((id, c))
        assert(fmt == "bmp" && gw == w && gh == h, s"id=$id cell=$c meta")
        assert(lum == sums(c) && np == counts(c), s"id=$id cell=$c: $lum/$np vs ${sums(c)}/${counts(c)}")
      }
    }
  }

  test("extractFeatures(ExactGridDecoder) == pixel-formula cell sums mod 2^24 (q126 contract)") {
    val df = MediaFixtures.withBmp(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.extractFeatures(df, "img", 9, Multimodal.ExactGridDecoder)
      .select(col("doc_id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (id <- ids) {
      val (w, h) = (MediaFixtures.imgW(id), MediaFixtures.imgH(id))
      val sums = new Array[Long](9)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (id * 7 + x * 13 + y * 31) % 256
        val g = (id * 11 + x * 3 + y * 17) % 256
        val b = (id * 5 + x * 23 + y * 29) % 256
        sums((y * 3 / h) * 3 + (x * 3 / w)) += r * 299 + g * 587 + b * 114
      }
      val feats = got(id)
      assert(feats.length == 9, s"id=$id dim")
      for (c <- 0 until 9)
        assert(feats(c) == (sums(c) % Multimodal.ExactGridDecoder.Mod).toFloat,
          s"id=$id cell=$c: ${feats(c)} vs ${sums(c) % Multimodal.ExactGridDecoder.Mod}")
    }
    // null payload and undecodable bytes ride the plumbing's zero-vector
    // convention (the contract the oracle row depends on for clean input)
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null)).toDF("doc_id", "img")
    val z = Multimodal.extractFeatures(junk, "img", 9, Multimodal.ExactGridDecoder)
      .select(col("features")).collect()
    assert(z.forall(_.getSeq[Float](0).forall(_ == 0.0f)))
  }

  test("audioWindowStats == sample-formula reduction (WAV PCM round trip)") {
    val df = MediaFixtures.withWav(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.audioWindowStats(df, "doc_id", "audio", 4)
      .collect().map(r => ((r.getLong(0), r.getInt(5)),
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(6), r.getLong(7)))).toMap
    for (id <- ids) {
      val n = MediaFixtures.wavSamples(id)
      val sums = new Array[Long](4)
      val counts = new Array[Long](4)
      for (i <- 0 until n) {
        val v = ((id * 31 + i.toLong * 7919) % 65536) - 32768
        val w = (i.toLong * 4 / n).toInt
        sums(w) += v
        counts(w) += 1
      }
      for (w <- 0 until 4) {
        val (fmt, rate, ch, dur, ss, ns) = got((id, w))
        assert(fmt == "wave" && rate == 8000 && ch == 1, s"id=$id meta ($fmt, $rate, $ch)")
        assert(dur == n * 1000L / 8000L, s"id=$id duration $dur vs ${n * 1000L / 8000L}")
        assert(ss == sums(w) && ns == counts(w), s"id=$id win=$w: $ss/$ns vs ${sums(w)}/${counts(w)}")
      }
    }
  }

  test("videoMetaStats == box-formula metadata (ISO-BMFF walk round trip)") {
    val df = MediaFixtures.withMp4(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.videoMetaStats(df, "doc_id", "video")
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    for (id <- ids) {
      assert(got(id) == (("isom", MediaFixtures.vidW(id), MediaFixtures.vidH(id),
        MediaFixtures.vidDurMs(id))), s"id=$id: ${got(id)}")
    }
  }

  test("videoMetaStats on AVI == avih-formula metadata (RIFF walk round trip)") {
    val df = MediaFixtures.withAvi(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.videoMetaStats(df, "doc_id", "video")
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    for (id <- ids) {
      assert(got(id) == (("avi", MediaFixtures.aviW(id), MediaFixtures.aviH(id),
        MediaFixtures.aviDurMs(id))), s"id=$id: ${got(id)}")
    }
  }

  test("audioWindowStats sums ALL channels of a stereo WAV (the fixture corpus is mono-only)") {
    // hand-built 2-channel WAV: frame f carries L = f+1, R = 10*(f+1)
    val n = 8
    val bb = java.nio.ByteBuffer.allocate(44 + n * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 4)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2) // PCM, stereo
      .putInt(8000).putInt(8000 * 4).putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 4)
    for (f <- 1 to n) { bb.putShort(f.toShort); bb.putShort((10 * f).toShort) }
    val df = Seq((1L, bb.array())).toDF("doc_id", "audio")
    val got = Multimodal.audioWindowStats(df, "doc_id", "audio", 2)
      .collect().map(r => (r.getInt(5), (r.getInt(3), r.getLong(6), r.getLong(7)))).toMap
    // window 0 = frames 1-4, window 1 = frames 5-8; sum = 11·Σf
    assert(got(0) == ((2, 11 * (1 + 2 + 3 + 4), 4L)), got(0))
    assert(got(1) == ((2, 11 * (5 + 6 + 7 + 8), 4L)), got(1))
  }

  test("null payloads and undecodable bytes emit no stats rows") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "img")
    assert(Multimodal.imageGridStats(junk, "doc_id", "img", 3).count() == 0)
    assert(Multimodal.audioWindowStats(junk, "doc_id", "img", 4).count() == 0)
    assert(Multimodal.videoMetaStats(junk, "doc_id", "img").count() == 0)
  }
}
