package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{BinaryType, StructType}

/**
 * Deterministic media payload generators — REAL format bytes (BMP via
 * ImageIO, canonical RIFF/WAVE PCM, ISO-BMFF box structure) whose
 * decoded content is a CLOSED-FORM function of the row id. This is what
 * lets the multimodal decode operators carry DuckDB oracle rows
 * (round-17 verdict item 4): Spark builds the container, the REAL
 * decoder ([[Multimodal.ImageDecoder]] / [[Multimodal.AudioDecoder]] /
 * [[Multimodal.VideoMeta]]) decodes it back, and the oracle re-derives
 * the same integer reductions arithmetically from the formulas below —
 * any drift in the writer, the JDK decode path, or the reduction
 * breaks the hash.
 *
 * All pixel/sample formulas use only Long arithmetic and mod — exact
 * in every engine. The formulas are PINNED: the q118–q120 oracle SQL
 * in SparkEntry restates them verbatim.
 */
object MediaFixtures {

  // ---- pinned formulas (restated in the q118-q120 oracle SQL) ----
  def imgW(id: Long): Int = (4 + id % 5).toInt
  def imgH(id: Long): Int = (3 + id % 4).toInt
  private def pxR(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 13 + y * 31) % 256).toInt
  private def pxG(id: Long, x: Int, y: Int): Int = ((id * 11 + x * 3 + y * 17) % 256).toInt
  private def pxB(id: Long, x: Int, y: Int): Int = ((id * 5 + x * 23 + y * 29) % 256).toInt

  val WavRate = 8000
  def wavSamples(id: Long): Int = (400 + (id % 100) * 4).toInt
  private def wavSample(id: Long, i: Int): Short =
    (((id * 31 + i.toLong * 7919) % 65536) - 32768).toShort

  def vidW(id: Long): Int = (320 + (id % 16) * 8).toInt
  def vidH(id: Long): Int = (240 + (id % 9) * 8).toInt
  def vidDurMs(id: Long): Long = 1000 + id % 5000

  // ---- binary builders ----

  /** 24-bit BMP with pixel (x, y) = (pxR, pxG, pxB): built as a raster
    * and written through ImageIO's BMP writer, so the DECODER under
    * test reads bytes a real writer produced, not a hand-rolled blob. */
  def bmpBytes(id: Long): Array[Byte] = {
    val (w, h) = (imgW(id), imgH(id))
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "bmp", bos), "JDK BMP writer unavailable")
    bos.toByteArray
  }

  /** Canonical 44-byte RIFF/WAVE header + little-endian signed 16-bit
    * mono PCM, sample i = wavSample(id, i) at 8 kHz. */
  def wavBytes(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(WavRate)
      .putInt(WavRate * 2) // byte rate
      .putShort(2)         // block align
      .putShort(16)        // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(wavSample(id, i)); i += 1 }
    bb.array()
  }

  /** Minimal ISO-BMFF (MP4) metadata skeleton: `ftyp` (major brand
    * isom) + `moov` { `mvhd` v0 (timescale 1000, duration = vidDurMs —
    * so parsed duration_ms is exact) + `trak` { `tkhd` v0 with 16.16
    * width/height in the final 8 bytes } }. No media data — the
    * [[Multimodal.VideoMeta]] walk under test reads only these boxes. */
  def mp4Bytes(id: Long): Array[Byte] = {
    def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(fourcc.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0))
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(20)
      bb.putInt(0)          // version 0 + flags
        .putInt(0).putInt(0) // creation / modification
        .putInt(1000)        // timescale
        .putInt(vidDurMs(id).toInt) // duration in timescale units = ms
      box("mvhd", bb.array())
    }
    val tkhd = {
      val p = java.nio.ByteBuffer.allocate(84)
      p.position(76)
      p.putInt(vidW(id) << 16).putInt(vidH(id) << 16) // 16.16 fixed
      box("tkhd", p.array())
    }
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  // AVI formulas (distinct from MP4's so a dispatch bug can't alias)
  val AviUsPerFrame = 40000L // 25 fps
  def aviW(id: Long): Int = (160 + (id % 12) * 16).toInt
  def aviH(id: Long): Int = (120 + (id % 7) * 16).toInt
  def aviFrames(id: Long): Long = 25 + id % 500
  def aviDurMs(id: Long): Long = AviUsPerFrame * aviFrames(id) / 1000L

  /** Minimal RIFF/AVI skeleton: `RIFF…AVI ` + `LIST hdrl { avih }` with
    * the main-header fields [[Multimodal.VideoMeta]]'s parseAvi reads —
    * µs/frame, total frames, width, height. Covers the little-endian
    * chunk walk the MP4 fixture can't. */
  def aviBytes(id: Long): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(AviUsPerFrame.toInt)  // µs per frame
      .putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
      .putInt(aviFrames(id).toInt)   // total frames
      .putInt(0).putInt(1).putInt(0) // initialFrames, streams, suggBufSize
      .putInt(aviW(id)).putInt(aviH(id))
    // (4 reserved ints stay zero)
    val hdrl = java.nio.ByteBuffer.allocate(12 + avih.capacity())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdrl.put("LIST".getBytes("US-ASCII")).putInt(4 + avih.capacity())
      .put("hdrl".getBytes("US-ASCII")).put(avih.array())
    val riff = java.nio.ByteBuffer.allocate(12 + hdrl.capacity())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(4 + hdrl.capacity())
      .put("AVI ".getBytes("US-ASCII")).put(hdrl.array())
    riff.array()
  }

  // ---- DataFrame builders (no shuffle; one payload per row) ----
  private def withBinary(df: DataFrame, idCol: String, out: String,
                         gen: Long => Array[Byte]): DataFrame = {
    val withId = df.withColumn(idCol, org.apache.spark.sql.functions.col(idCol).cast("long"))
    val schema: StructType = withId.schema.add(out, BinaryType)
    val idx = withId.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withId.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ gen(r.getLong(idx))))
    }(enc)
  }

  def withBmp(df: DataFrame, idCol: String, out: String = "img"): DataFrame =
    withBinary(df, idCol, out, bmpBytes)
  def withWav(df: DataFrame, idCol: String, out: String = "audio"): DataFrame =
    withBinary(df, idCol, out, wavBytes)
  def withMp4(df: DataFrame, idCol: String, out: String = "video"): DataFrame =
    withBinary(df, idCol, out, mp4Bytes)
  def withAvi(df: DataFrame, idCol: String, out: String = "video"): DataFrame =
    withBinary(df, idCol, out, aviBytes)
}
