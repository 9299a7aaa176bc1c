package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (north-star EXT): image/audio/video
  * payloads travel as opaque `BinaryType` columns with typed metadata —
  * the direct generalization of the reference's raw byte[] cell values
  * (`HBaseScheme.java:101-102`).
  *
  * IMAGE decode and resize are REAL: [[MediaCodec.imageIO]] binds the
  * JDK-built-in `javax.imageio` reader (PNG/JPEG/BMP/GIF) and
  * [[MediaCodec.imageResize]] adds an exact nearest-neighbor resample,
  * both exercised end-to-end by oracle queries. AUDIO decode is REAL
  * for WAV/PCM: [[MediaCodec.wavPcm]] is a hand-rolled RIFF chunk
  * walker (PCM needs no codec library), oracle-checked by
  * `mm_audio_decode`. Compressed audio (mp3/aac) and video codecs are
  * not present in this environment and stay stubbed behind
  * [[MediaCodec.stub]]: the Spark-side plumbing (schema, batched
  * per-partition execution, fixed-width feature output, partitioning
  * behavior) is identical either way — swap in a JNI/ffmpeg binding in
  * production.
  */
object Multimodal {

  /** Canonical media-row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Wrap a text/binary source column as a media payload. */
  def asPayload(c: Column): Column = c.cast("binary")

  def byteLen(payload: Column): Column = length(payload)

  /** Content address of the payload (dedup / caching key). */
  def contentKey(payload: Column): Column = md5(payload)

  /** STUB decode: a deterministic fake "feature vector" derived from the
    * payload hash — stands in for decode→resize→embed until a real codec
    * is bound. Shape and determinism match what a real extractor must
    * provide (fixed dim, pure function of bytes). */
  def fakeFeatures(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload, i), lit(1000L))).cast("double") / 1000.0)

  /** Frame-sampling stub: how many frames a video of `durationMs` yields
    * at `everyMs` sampling — the planning arithmetic is real even though
    * frame extraction is not available here. */
  def sampledFrameCount(durationMs: Column, everyMs: Int): Column =
    greatest(lit(1), (durationMs / everyMs).cast("int"))

  /** Batched per-partition decode plumbing: the real pattern for codec
    * work in Scala Spark (the JVM analog of Python's mapInPandas) —
    * payloads are processed partition-at-a-time through an arbitrary
    * codec function without per-row task overhead, preserving
    * partitioning. `codec` is applied lazily over the iterator so
    * constant per-partition setup (codec init) happens once.
    */
  def decodePartitioned[T: Encoder](payloads: Dataset[Array[Byte]],
                                    codec: MediaCodec[T]): Dataset[T] =
    payloads.mapPartitions { it =>
      val c = codec.open()
      it.map(c.decode)
    }

  /** Deterministic row-gradient PNG: row `y` is the uniform gray
    * `(gray0 + y) % 256`. Lossless like [[makePng]], but with per-row
    * structure, so a resample's row-selection arithmetic (which source
    * rows survive) is itself oracle-checkable — a uniform image would
    * hide resampling bugs behind an unchanged mean. */
  def makeGradientPng(width: Int, height: Int, gray0: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      val g = (gray0 + y) % 256
      val rgb = (g << 16) | (g << 8) | g
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL nearest-neighbor resample to `tw`×`th`: target pixel (x,y)
    * takes source pixel (⌊x·w/tw⌋, ⌊y·h/th⌋). Hand-rolled (not AWT's
    * `getScaledInstance`) so the sampling arithmetic is exact and
    * engine-independent — the oracle recomputes it in SQL. */
  def resizeNearest(src: java.awt.image.BufferedImage,
                    tw: Int, th: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val (w, h) = (src.getWidth, src.getHeight)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, src.getRGB((x.toLong * w / tw).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic 16-bit mono PCM WAV (RIFF) payload generator — the
    * audio twin of [[makePng]]: PCM is uncompressed, so decoded rate /
    * sample count / amplitudes are exact functions of the inputs,
    * checkable by a non-audio oracle. */
  def makeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)                   // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16)                  // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic YUV4MPEG2 (.y4m) payload generator — uncompressed
    * 4:2:0 video: plain-text stream header, then `FRAME\n` + raw
    * Y/U/V planes per frame. Frame `f` is uniform luma `lumas(f)`
    * (chroma neutral 128), so decoded dimensions, frame counts, and
    * sampled-luma means are exact arithmetic, checkable by a
    * non-video oracle. */
  def makeY4m(w: Int, h: Int, lumas: Array[Int]): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dimensions")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    lumas.foreach { l =>
      out.write(frameHdr)
      out.write(Array.fill(w * h)(l.toByte))
      val uv = Array.fill(w * h / 4)(128.toByte)
      out.write(uv); out.write(uv)
    }
    out.toByteArray
  }

  /** Deterministic uniform-gray PNG — the test/query payload generator
    * (PNG is lossless, so decoded dimensions and pixel means are exact
    * arithmetic functions of the inputs, checkable by a non-image
    * oracle). */
  def makePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic uniform-gray JPEG — the COMPRESSED-image payload
    * generator ([[makePng]]'s lossy twin), encoded through the JDK's
    * own JPEG writer at an explicit quality. A uniform field is the
    * one image JPEG reproduces exactly: every 8×8 block is DC-only
    * (all AC coefficients are zero), so quantization round-trips the
    * block to the identical gray — verified exhaustively for all 256
    * grays at q=0.9 over this query family's dimensions. That makes a
    * real lossy-codec encode→decode pipeline exactly oracle-checkable:
    * decoded dims AND pixel mean are pure functions of the inputs. */
  def makeJpeg(width: Int, height: Int, gray: Int,
               quality: Float = 0.9f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }
}

/** Codec boundary: `open()` once per partition (native lib handles),
  * `decode` per payload. */
trait MediaCodec[T] extends Serializable {
  def open(): MediaCodec.Session[T]
}

object MediaCodec {
  trait Session[T] extends Serializable { def decode(bytes: Array[Byte]): T }

  /** The environment's deterministic stand-in codec: byte-length +
    * first-bytes checksum. Replace with an image/audio binding in prod. */
  def stub: MediaCodec[(Int, Long)] = () => new Session[(Int, Long)] {
    def decode(bytes: Array[Byte]): (Int, Long) =
      (bytes.length, bytes.take(16).foldLeft(1125899906842597L)((h, b) => 31 * h + b))
  }

  /** REAL audio codec for WAV/PCM — a hand-rolled RIFF chunk walker
    * (no codec libs needed: PCM is raw little-endian samples behind a
    * chunked header). Walks chunks in any order, skips unknown ones,
    * honours word alignment; returns (sample rate, sample count, mean
    * |amplitude|). Compressed audio (mp3/aac) still needs an external
    * binding — see [[stub]] — but uncompressed audio, the dominant
    * interchange format in training pipelines, is fully real here. */
  def wavPcm: MediaCodec[(Int, Int, Long)] = () => new Session[(Int, Int, Long)] {
    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
      require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "payload is not RIFF/WAVE")
      var pos = 12
      var rate = -1; var bits = -1; var channels = -1
      var n = 0; var meanAbs = 0L; var sawData = false
      while (pos + 8 <= bytes.length) {
        val id = tag(pos)
        val size = bb.getInt(pos + 4)
        val body = pos + 8
        id match {
          case "fmt " =>
            require(bb.getShort(body) == 1, "only PCM wav supported")
            channels = bb.getShort(body + 2)
            rate = bb.getInt(body + 4)
            bits = bb.getShort(body + 14)
          case "data" =>
            require(rate > 0, "data chunk before fmt")
            require(bits == 16 && channels == 1, "expect 16-bit mono PCM")
            n = size / 2
            var i = 0; var sum = 0L
            while (i < n) { sum += math.abs(bb.getShort(body + 2 * i).toLong); i += 1 }
            meanAbs = if (n == 0) 0L else sum / n
            sawData = true
          case _ => () // LIST/INFO/fact/... — skip
        }
        pos = body + size + (size & 1) // RIFF chunks are word-aligned
      }
      require(sawData, "no data chunk")
      (rate, n, meanAbs)
    }
  }

  /** REAL video frame-sampling for uncompressed YUV4MPEG2 — a
    * hand-rolled .y4m parser (header tags, per-frame `FRAME` markers,
    * raw 4:2:0 planes; no codec libs needed). Decodes every
    * `every`-th frame's Y plane and returns (width, height, total
    * frames, sampled frames, mean luma over sampled pixels) — the
    * frame-sampling step of a video training pipeline, for real.
    * Compressed video (h264/vp9) still needs an ffmpeg binding — see
    * [[stub]]. */
  def y4mFrameSample(every: Int): MediaCodec[(Int, Int, Int, Int, Long)] =
    () => new Session[(Int, Int, Int, Int, Long)] {
      def decode(bytes: Array[Byte]): (Int, Int, Int, Int, Long) = {
        var nl = 0
        while (nl < bytes.length && bytes(nl) != '\n') nl += 1
        require(nl > 9 && nl < bytes.length, "missing y4m stream header")
        val header = new String(bytes, 0, nl, "US-ASCII")
        require(header.startsWith("YUV4MPEG2"), "payload is not YUV4MPEG2")
        var w = -1; var h = -1
        header.split(' ').drop(1).foreach { t =>
          if (t.startsWith("W")) w = t.tail.toInt
          else if (t.startsWith("H")) h = t.tail.toInt
          else if (t.startsWith("C")) require(t == "C420", "only 4:2:0 supported")
        }
        require(w > 0 && h > 0, "y4m header missing W/H")
        val frameLen = w * h + 2 * (w * h / 4)
        var pos = nl + 1
        var frames = 0; var sampled = 0; var sum = 0L
        while (pos < bytes.length) {
          require(pos + 5 <= bytes.length &&
            new String(bytes, pos, 5, "US-ASCII") == "FRAME", "bad FRAME marker")
          var q = pos
          while (bytes(q) != '\n') q += 1 // FRAME may carry parameters
          val body = q + 1
          require(body + frameLen <= bytes.length, "truncated frame")
          if (frames % every == 0) {
            var i = 0
            while (i < w * h) { sum += bytes(body + i) & 0xff; i += 1 }
            sampled += 1
          }
          frames += 1
          pos = body + frameLen
        }
        require(frames > 0, "no frames")
        (w, h, frames, sampled,
          if (sampled == 0) 0L else sum / (sampled.toLong * w * h))
      }
    }

  /** REAL decode→resize codec: `javax.imageio` decode, then
    * [[Multimodal.resizeNearest]] to `tw`×`th`, returning the resized
    * (width, height, mean red-channel). This is the standard
    * image-normalization step of a multimodal training pipeline (decode
    * → fixed-size resample → featurize), with the resample arithmetic
    * deterministic enough to verify without an image oracle. */
  def imageResize(tw: Int, th: Int): MediaCodec[(Int, Int, Long)] = () => {
    javax.imageio.ImageIO.setUseCache(false)
    new Session[(Int, Int, Long)] {
      def decode(bytes: Array[Byte]): (Int, Int, Long) = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, "payload is not a decodable image")
        val r = Multimodal.resizeNearest(img, tw, th)
        var sum = 0L
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) { sum += (r.getRGB(x, y) >> 16) & 0xff; x += 1 }
          y += 1
        }
        (tw, th, sum / (tw.toLong * th))
      }
    }
  }

  /** REAL image codec over the JDK-built-in `javax.imageio` readers
    * (PNG/JPEG/BMP/GIF): bytes → (width, height, mean red-channel
    * value). The in-memory cache is pinned per session so decoding
    * never touches scratch disk. */
  def imageIO: MediaCodec[(Int, Int, Long)] = () => {
    javax.imageio.ImageIO.setUseCache(false) // once per partition/session
    new Session[(Int, Int, Long)] {
      def decode(bytes: Array[Byte]): (Int, Int, Long) = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, "payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
          y += 1
        }
        (w, h, sum / (w.toLong * h))
      }
    }
  }
}
