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
  * `mm_audio_decode` — and REAL for COMPRESSED IMA-ADPCM WAV:
  * [[MediaCodec.wavAdpcm]] implements the public IMA/DVI 4-bit
  * adaptive-delta spec in pure JVM code (oracle-checked by
  * `mm_audio_adpcm`). VIDEO is REAL for uncompressed YUV4MPEG2
  * ([[MediaCodec.y4mFrameSample]]) and for COMPRESSED MJPEG-in-AVI
  * ([[MediaCodec.aviMjpegFrameSample]]: RIFF/AVI container walk +
  * per-frame JDK JPEG decode, oracle-checked by `mm_video_mjpeg`).
  * Codecs needing native libraries this environment does not ship
  * (mp3/aac, and INTER-frame video h264/vp9) stay stubbed behind
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
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      val g = (gray0 + y) % 256
      java.util.Arrays.fill(row, (g << 16) | (g << 8) | g)
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    encodeWith(pngWriter.get(), img, null)
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
    // Row-bulk get/set with a precomputed x-map and a last-source-row
    // cache: value-identical to per-pixel getRGB/setRGB (the bulk forms
    // run every pixel through the same default-sRGB ColorModel
    // conversion, just inside one JDK loop instead of per call), and an
    // order of magnitude faster on the byte-raster images the JPEG/PNG
    // decoders produce.
    val srcRow = new Array[Int](w)
    val outRow = new Array[Int](tw)
    val xmap = Array.tabulate(tw)(x => (x.toLong * w / tw).toInt)
    var lastSy = -1
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      if (sy != lastSy) { src.getRGB(0, sy, w, 1, srcRow, 0, w); lastSy = sy }
      var x = 0
      while (x < tw) { outRow(x) = srcRow(xmap(x)); x += 1 }
      out.setRGB(0, y, tw, 1, outRow, 0, tw)
      y += 1
    }
    out
  }

  /** Sum of the red channel (the luma proxy every mm_* featurizer
    * uses) over a whole image via row-bulk `getRGB` — value-identical
    * to summing per-pixel `img.getRGB(x, y)` (both paths convert each
    * pixel through the identical default-sRGB ColorModel), but the
    * per-pixel form re-dispatches through the color model once per
    * CALL, which dominated the decode queries' profiles. */
  def redSum(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val row = new Array[Int](w)
    var sum = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) { sum += (row(x) >> 16) & 0xff; x += 1 }
      y += 1
    }
    sum
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

  /** One ImageWriter per (thread, format): the payload generators run
    * per-row inside task threads, and a fresh
    * `ImageIO.getImageWritersByFormatName(...).next()` per call is a
    * registry scan + codec construction per FRAME. Worse,
    * `ImageIO.createImageOutputStream` obeys the global use-cache flag
    * (default TRUE) and backs each encode with a scratch FILE on disk.
    * Encoding through a reused per-thread writer into a
    * [[javax.imageio.stream.MemoryCacheImageOutputStream]] is
    * byte-identical (same codec, same params — verified exhaustively
    * over this family's dimensions and all 256 grays) and ~4× faster
    * per frame. ImageWriter is not thread-safe; the ThreadLocal is the
    * confinement. */
  private def threadWriter(format: String) = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      javax.imageio.ImageIO.getImageWritersByFormatName(format).next()
  }
  private val pngWriter = threadWriter("png")
  private val jpgWriter = threadWriter("jpg")
  private val gifWriter = threadWriter("gif")
  private val tiffWriter = threadWriter("tiff")

  private def encodeWith(writer: javax.imageio.ImageWriter,
                         img: java.awt.image.BufferedImage,
                         params: javax.imageio.ImageWriteParam): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally ios.close()
    bos.toByteArray
  }

  /** Deterministic uniform-gray PNG — the test/query payload generator
    * (PNG is lossless, so decoded dimensions and pixel means are exact
    * arithmetic functions of the inputs, checkable by a non-image
    * oracle). */
  def makePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](width)
    java.util.Arrays.fill(row, (gray << 16) | (gray << 8) | gray)
    var y = 0
    while (y < height) { img.setRGB(0, y, width, 1, row, 0, width); y += 1 }
    encodeWith(pngWriter.get(), img, null)
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
    val row = new Array[Int](width)
    java.util.Arrays.fill(row, (gray << 16) | (gray << 8) | gray)
    var y = 0
    while (y < height) { img.setRGB(0, y, width, 1, row, 0, width); y += 1 }
    val writer = jpgWriter.get()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    encodeWith(writer, img, params)
  }

  /** Deterministic MJPEG-in-AVI payload generator — the COMPRESSED-video
    * twin of [[makeY4m]]: a RIFF/AVI container (`hdrl` with `avih` +
    * `strl`, then a `movi` LIST) whose `00dc` chunks each hold one full
    * JPEG frame from the same JDK encoder as [[makeJpeg]]. Frame `f` is
    * the uniform gray `grays(f)` — DC-only blocks round-trip exactly
    * (see [[makeJpeg]]), so decoded dimensions, frame counts and
    * sampled-luma means stay exact arithmetic even through a genuinely
    * compressed video format. */
  def makeMjpegAvi(w: Int, h: Int, grays: Array[Int]): Array[Byte] = {
    require(grays.nonEmpty, "avi payload needs at least one frame")
    val frames = grays.map(g => makeJpeg(w, h, g))
    def fourcc(s: String) = s.getBytes("US-ASCII")
    val moviBody = new java.io.ByteArrayOutputStream()
    // idx1 entries: per-frame (fourcc, AVIIF_KEYFRAME, offset, size),
    // offset relative to the 'movi' fourcc (the standard convention —
    // the first chunk header sits at offset 4). The index is what
    // makes FRAME RANDOM ACCESS possible without scanning movi (see
    // [[aviFrameAt]]); every MJPEG frame is a keyframe.
    val idxEntries = frames.map { j =>
      val off = 4 + moviBody.size()
      val cb = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      cb.put(fourcc("00dc")); cb.putInt(j.length)
      moviBody.write(cb.array()); moviBody.write(j)
      if ((j.length & 1) == 1) moviBody.write(0) // RIFF word alignment
      (off, j.length)
    }
    val idx1 = java.nio.ByteBuffer.allocate(16 * frames.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    idxEntries.foreach { case (off, size) =>
      idx1.put(fourcc("00dc"))
      idx1.putInt(0x10) // AVIIF_KEYFRAME
      idx1.putInt(off)
      idx1.putInt(size)
    }
    val idx1Arr = idx1.array()
    val movi = moviBody.toByteArray
    // avih (56 bytes) + one video stream: strh (56) + strf/BITMAPINFOHEADER (40)
    val hdrl = java.nio.ByteBuffer.allocate(4 + 8 + 56 + 8 + 4 + 8 + 56 + 8 + 40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdrl.put(fourcc("hdrl"))
    hdrl.put(fourcc("avih")); hdrl.putInt(56)
    hdrl.putInt(40000)              // usec/frame (25 fps)
    hdrl.putInt(0); hdrl.putInt(0)
    hdrl.putInt(0x10)               // flags: AVIF_HASINDEX
    hdrl.putInt(frames.length)      // total frames
    hdrl.putInt(0); hdrl.putInt(1)  // initial frames, streams
    hdrl.putInt(frames.map(_.length).max)
    hdrl.putInt(w); hdrl.putInt(h)
    hdrl.putInt(0); hdrl.putInt(0); hdrl.putInt(0); hdrl.putInt(0)
    hdrl.put(fourcc("LIST"))
    hdrl.putInt(4 + 8 + 56 + 8 + 40) // strl LIST size
    hdrl.put(fourcc("strl"))
    hdrl.put(fourcc("strh")); hdrl.putInt(56)
    hdrl.put(fourcc("vids")); hdrl.put(fourcc("MJPG"))
    hdrl.putInt(0); hdrl.putInt(0)  // flags, priority+language
    hdrl.putInt(0)                  // initial frames
    hdrl.putInt(1); hdrl.putInt(25) // scale, rate (25 fps)
    hdrl.putInt(0)                  // start
    hdrl.putInt(frames.length)      // length (frames)
    hdrl.putInt(frames.map(_.length).max)
    hdrl.putInt(-1); hdrl.putInt(0) // quality, sample size
    hdrl.putShort(0); hdrl.putShort(0)
    hdrl.putShort(w.toShort); hdrl.putShort(h.toShort) // rcFrame
    hdrl.put(fourcc("strf")); hdrl.putInt(40)
    hdrl.putInt(40)                 // biSize
    hdrl.putInt(w); hdrl.putInt(h)
    hdrl.putShort(1); hdrl.putShort(24) // planes, bit count
    hdrl.put(fourcc("MJPG"))        // biCompression
    hdrl.putInt(w * h * 3)          // biSizeImage
    hdrl.putInt(0); hdrl.putInt(0); hdrl.putInt(0); hdrl.putInt(0)
    val hdrlArr = hdrl.array()
    val riffLen = 4 + 8 + hdrlArr.length + 8 + 4 + movi.length +
      8 + idx1Arr.length
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc("RIFF")); bb.putInt(riffLen); bb.put(fourcc("AVI "))
    bb.put(fourcc("LIST")); bb.putInt(hdrlArr.length); bb.put(hdrlArr)
    bb.put(fourcc("LIST")); bb.putInt(4 + movi.length); bb.put(fourcc("movi"))
    bb.put(movi)
    bb.put(fourcc("idx1")); bb.putInt(idx1Arr.length); bb.put(idx1Arr)
    bb.array()
  }

  /** RANDOM ACCESS into an MJPEG AVI via its `idx1` index — the video
    * analogue of [[Flac.decodeAt]]'s seek table: resolve frame
    * `frameIx` by walking ONLY the top-level chunk directory (hdrl for
    * the declared geometry/flags, the movi LIST skipped whole by its
    * size, idx1 for the frame table) and decode ONLY the indexed byte
    * range — at 100 TB this is a byte-range GET per sampled frame,
    * never a stream scan. The index must EARN trust: avih must
    * declare AVIF_HASINDEX, the entry count must equal the declared
    * frame total, the entry must point at a `00dc` chunk header whose
    * size agrees with the entry, and the decoded frame must match the
    * declared geometry — a directory that lies is an error, not a
    * hint (the [[Ico]] discipline). Returns (width, height, total
    * frames, mean luma of that frame). */
  def aviFrameAt(bytes: Array[Byte], frameIx: Int): (Int, Int, Int, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "payload is not RIFF/AVI")
    var declW = -1; var declH = -1; var declFrames = -1; var flags = 0
    var moviPos = -1 // position of the 'movi' fourcc
    var idxPos = -1; var idxLen = 0
    var pos = 12
    while (pos + 8 <= bytes.length) { // TOP-LEVEL walk only
      val id = tag(pos)
      val size = bb.getInt(pos + 4)
      val body = pos + 8
      require(body + size <= bytes.length, s"truncated $id chunk")
      id match {
        case "LIST" if size >= 4 && tag(body) == "hdrl" =>
          // one nested walk for avih (headers are tiny)
          var p = body + 4
          while (p + 8 <= body + size) {
            val hid = tag(p); val hsize = bb.getInt(p + 4)
            require(p + 8 + hsize <= body + size, s"truncated $hid")
            if (hid == "avih") {
              flags = bb.getInt(p + 8 + 12)
              declFrames = bb.getInt(p + 8 + 16)
              declW = bb.getInt(p + 8 + 32); declH = bb.getInt(p + 8 + 36)
            }
            p = p + 8 + hsize + (hsize & 1)
          }
        case "LIST" if size >= 4 && tag(body) == "movi" =>
          moviPos = body // NOT entered: the whole point of the index
        case "idx1" => idxPos = body; idxLen = size
        case _ => ()
      }
      pos = body + size + (size & 1)
    }
    require((flags & 0x10) != 0, "avih does not declare AVIF_HASINDEX")
    require(moviPos >= 0, "no movi list")
    require(idxPos >= 0, "no idx1 index chunk")
    require(idxLen % 16 == 0, "idx1 length not a multiple of 16")
    val nEntries = idxLen / 16
    require(nEntries == declFrames,
      s"idx1 holds $nEntries entries for $declFrames declared frames")
    require(frameIx >= 0 && frameIx < nEntries,
      s"frame $frameIx out of range (0 until $nEntries)")
    val e = idxPos + 16 * frameIx
    require(tag(e) == "00dc", s"idx1 entry $frameIx is not a video chunk")
    val off = bb.getInt(e + 8); val size = bb.getInt(e + 12)
    val chunkPos = moviPos + off
    require(chunkPos >= moviPos + 4 && chunkPos + 8 + size <= bytes.length,
      s"idx1 entry $frameIx points outside the stream")
    require(tag(chunkPos) == "00dc" && bb.getInt(chunkPos + 4) == size,
      s"idx1 entry $frameIx disagrees with the chunk it points at")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes, chunkPos + 8, size))
    require(img != null, "indexed frame is not a decodable JPEG")
    require(img.getWidth == declW && img.getHeight == declH,
      s"frame ${img.getWidth}x${img.getHeight} != avih ${declW}x$declH")
    (declW, declH, declFrames,
      redSum(img) / (declW.toLong * declH))
  }

  /** Deterministic animated GIF payload generator — the third real
    * video container ([[makeY4m]] uncompressed, [[makeMjpegAvi]]
    * intra-frame JPEG, and here the JDK's own multi-image sequence
    * writer: GIF87a/89a with LZW-compressed frames). GIF is lossless
    * and a uniform-gray frame yields an exact one-entry palette, so
    * decoded dimensions, frame counts and sampled-luma means stay
    * exact arithmetic (verified exhaustively over the query family's
    * dimension/gray grid). Frame `f` is the uniform gray `grays(f)`. */
  def makeGif(w: Int, h: Int, grays: Array[Int]): Array[Byte] = {
    require(grays.nonEmpty, "gif payload needs at least one frame")
    val writer = gifWriter.get()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val row = new Array[Int](w)
        java.util.Arrays.fill(row, (g << 16) | (g << 8) | g)
        var y = 0
        while (y < h) { img.setRGB(0, y, w, 1, row, 0, w); y += 1 }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally ios.close()
    bos.toByteArray
  }

  /** Deterministic gradient TIFF — the second COMPRESSED-image payload
    * generator (after [[makeJpeg]]): the JDK's own TIFF writer with
    * explicit LZW compression. TIFF/LZW is LOSSLESS, so unlike the
    * JPEG path the payload can be a full per-pixel gradient — pixel
    * (x,y) is the gray `(base + 3x + 11y) mod 256` — and decoded
    * dimensions AND the pixel mean stay exact integer arithmetic over
    * a genuinely compressed container (strip layout, LZW codes,
    * little/big-endian IFDs all exercised on the read side).
    * Round-trip verified exhaustively over this query family's
    * (width, height, base) grid before wiring. */
  def makeTiff(width: Int, height: Int, base: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = (base + 3 * x + 11 * y) % 256
        row(x) = (g << 16) | (g << 8) | g
        x += 1
      }
      img.setRGB(0, y, width, 1, row, 0, width)
      y += 1
    }
    val writer = tiffWriter.get()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionType("LZW")
    encodeWith(writer, img, params)
  }

  /** G.711 A-law encode (the ITU telephony codec's European half,
    * public spec — same integer reference arithmetic as the classic
    * public-domain g711.c): 16-bit sample → 13-bit magnitude
    * (`>> 3`, negatives as one's-complement `-p-1`), segment by
    * doubling thresholds, 4-bit mantissa, XOR with the 0x55 toggle
    * mask (0xD5 when positive — A-law's even-bit inversion for line
    * transmission). Pure integer arithmetic, no tables. */
  def alawEncode(sample: Int): Int = {
    val p = sample >> 3
    val (mask, m0) = if (p >= 0) (0xD5, p) else (0x55, -p - 1)
    val m = math.min(m0, 0xFFF) // clip out-of-16-bit inputs to the max code
    val seg =
      if (m < 0x20) 0 else if (m < 0x40) 1 else if (m < 0x80) 2
      else if (m < 0x100) 3 else if (m < 0x200) 4 else if (m < 0x400) 5
      else if (m < 0x800) 6 else 7
    val mant = if (seg < 2) (m >> 1) & 0x0F else (m >> seg) & 0x0F
    ((seg << 4) | mant) ^ mask
  }

  /** G.711 A-law decode — the exact integer inverse expansion:
    * un-toggle with 0x55, then magnitude `(mant·16 + 8)` in segment 0
    * and `(mant·16 + 264) << (seg−1)` above, sign from the (post-XOR)
    * top bit (set = positive). `alawDecode(alawEncode(x))` is a
    * deterministic quantization any engine recomputes exactly. */
  def alawDecode(code: Int): Int = {
    val c = (code ^ 0x55) & 0xFF
    val mant = c & 0x0F
    val seg = (c >> 4) & 7
    val t = if (seg == 0) (mant << 4) + 8 else ((mant << 4) + 0x108) << (seg - 1)
    if ((c & 0x80) != 0) t else -t
  }

  /** Deterministic G.711 A-law WAV (format tag 6) payload generator —
    * [[makeUlawWav]]'s European sibling: 8-bit A-law codes in a
    * standard RIFF/WAVE container, encoded by [[alawEncode]]'s exact
    * integer arithmetic. */
  def makeAlawWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(6); bb.putShort(1)                // A-law, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate)  // byte rate (8-bit)
    bb.putShort(1); bb.putShort(8)                // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(s => bb.put(alawEncode(s.toInt).toByte))
    bb.array()
  }

  /** G.711 μ-law encode (the ITU telephony codec, public spec):
    * pure-integer sign/segment/mantissa arithmetic — no tables, no
    * floats — so `ulawDecode(ulawEncode(x))` is a deterministic
    * quantization ANY engine can recompute exactly. Input is a 16-bit
    * sample; output the complemented 8-bit code. */
  def ulawEncode(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    var s = math.min(if (sample < 0) -sample else sample, 32635) + 0x84
    var exp = 7
    while (exp > 0 && (s & (0x80 << exp)) == 0) exp -= 1
    val mant = (s >> (exp + 3)) & 0x0F
    ~(sign | (exp << 4) | mant) & 0xFF
  }

  /** G.711 μ-law decode — the exact integer inverse expansion:
    * magnitude = ((mant·8 + 132) << exp) − 132, negated on the sign
    * bit. */
  def ulawDecode(code: Int): Int = {
    val c = ~code & 0xFF
    val exp = (c >> 4) & 7
    val mant = c & 0x0F
    val t = (((mant << 3) + 0x84) << exp) - 0x84
    if ((c & 0x80) != 0) -t else t
  }

  /** Deterministic G.711 μ-law WAV (format tag 7) payload generator —
    * the telephony-codec sibling of [[makeAdpcmWav]]: 8-bit μ-law
    * codes in a standard RIFF/WAVE container. Encoding is
    * [[ulawEncode]]'s exact integer arithmetic, so the decoded
    * samples (and their quantization) are pure functions of the
    * input, recomputable by a non-audio oracle. */
  def makeUlawWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(7); bb.putShort(1)                // μ-law, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate)  // byte rate (8-bit)
    bb.putShort(1); bb.putShort(8)                // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(s => bb.put(ulawEncode(s.toInt).toByte))
    bb.array()
  }

  /** Deterministic IMA-ADPCM WAV (format tag 0x11) payload generator —
    * the COMPRESSED-audio twin of [[makeWav]]: 4-bit adaptive delta
    * coding (~4:1 over 16-bit PCM) per the public IMA/DVI spec. One
    * block per payload: 4-byte state header (initial predictor, step
    * index) then packed nibbles, with the spec's `fact` chunk carrying
    * the true sample count and the extended `fmt ` carrying
    * samplesPerBlock. Encoding is exact arithmetic, so for a given
    * input signal the decoded output (and its quantization error) is
    * fully deterministic — what the oracle queries rely on. */
  def makeAdpcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.nonEmpty, "adpcm payload needs at least one sample")
    val n = samples.length
    val nibbleBytes = (n - 1 + 1) / 2 // sample 0 lives in the header
    val blockAlign = 4 + nibbleBytes + (nibbleBytes & 1) // word-aligned
    val data = new Array[Byte](blockAlign)
    val st = new ImaAdpcm.State(samples(0), 0)
    data(0) = (samples(0) & 0xff).toByte
    data(1) = ((samples(0) >> 8) & 0xff).toByte
    data(2) = st.index.toByte
    data(3) = 0
    var i = 1
    while (i < n) {
      val nib = st.encode(samples(i))
      val off = 4 + (i - 1) / 2
      if (((i - 1) & 1) == 0) data(off) = (nib & 0x0f).toByte // low first
      else data(off) = (data(off) | (nib << 4)).toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(12 + 28 + 12 + 8 + blockAlign)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(4 + 28 + 12 + 8 + blockAlign)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(20)
    bb.putShort(0x11); bb.putShort(1)            // IMA ADPCM, mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign / math.max(1, 1 + 2 * (blockAlign - 4)))
    bb.putShort(blockAlign.toShort); bb.putShort(4) // block align, bits
    bb.putShort(2)                                // cbSize
    bb.putShort((1 + 2 * (blockAlign - 4)).toShort) // samplesPerBlock
    bb.put("fact".getBytes("US-ASCII")); bb.putInt(4); bb.putInt(n)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(blockAlign)
    bb.put(data)
    bb.array()
  }
}

/** IMA/DVI ADPCM state machine (public spec: IMA Digital Audio Focus
  * and Technical Working Groups, "Recommended Practices for Enhancing
  * Digital Audio Compatibility", rev 3.00 — the step/index tables and
  * the quantize/reconstruct recurrences are normative and reproduced
  * by every implementation). Used by both the encoder fixture and the
  * real decoder so the two cannot drift. */
private[multimodal] object ImaAdpcm {
  val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  val indexTable: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  final class State(var predictor: Int, var index: Int) {
    private def clamp(): Unit = {
      if (predictor > 32767) predictor = 32767
      if (predictor < -32768) predictor = -32768
      if (index < 0) index = 0
      if (index > 88) index = 88
    }
    /** Reconstruct from one nibble (the decoder recurrence). */
    def decode(nibble: Int): Int = {
      val step = stepTable(index)
      var diff = step >> 3
      if ((nibble & 1) != 0) diff += step >> 2
      if ((nibble & 2) != 0) diff += step >> 1
      if ((nibble & 4) != 0) diff += step
      if ((nibble & 8) != 0) predictor -= diff else predictor += diff
      index += indexTable(nibble & 0x0f)
      clamp()
      predictor
    }
    /** Quantize one target sample to a nibble AND advance through the
      * decoder recurrence (encoder state must track the decoder's). */
    def encode(sample: Int): Int = {
      val step = stepTable(index)
      var diff = sample - predictor
      var nibble = 0
      if (diff < 0) { nibble = 8; diff = -diff }
      if (diff >= step) { nibble |= 4; diff -= step }
      if (diff >= (step >> 1)) { nibble |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) nibble |= 1
      decode(nibble)
      nibble
    }
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

  /** REAL compressed-audio codec for IMA-ADPCM WAV (format tag 0x11) —
    * a pure-JVM implementation of the public IMA/DVI spec (see
    * [[ImaAdpcm]]): RIFF chunk walk, per-block state header, 4-bit
    * adaptive delta reconstruction, `fact`-chunk sample-count
    * truncation. Returns (sample rate, decoded sample count, decoded
    * samples) so callers can check the reconstruction against the
    * source signal — this is a genuinely COMPRESSED format (~4:1), the
    * audio analogue of the JPEG round-trip, shrinking the "compressed
    * media is stubbed" gap to mp3/aac/h264 (which need native libs
    * this environment does not ship). */
  /** REAL compressed-audio codec for G.711 μ-law WAV (format tag 7):
    * RIFF chunk walk + the exact integer expansion of
    * [[Multimodal.ulawDecode]]. Returns (rate, sample count, mean
    * |decoded amplitude|) like [[wavPcm]] — the mean is over the
    * DECODED samples, so the lossy codec's quantization is part of
    * the oracle-checked value, not just a tolerance band. */
  def wavUlaw: MediaCodec[(Int, Int, Long)] = () => new Session[(Int, Int, Long)] {
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
            require(bb.getShort(body) == 7, "only mu-law wav supported")
            channels = bb.getShort(body + 2)
            rate = bb.getInt(body + 4)
            bits = bb.getShort(body + 14)
          case "data" =>
            require(rate > 0, "data chunk before fmt")
            require(bits == 8 && channels == 1, "expect 8-bit mono mu-law")
            n = size
            var i = 0; var sum = 0L
            while (i < n) {
              sum += math.abs(Multimodal.ulawDecode(bytes(body + i) & 0xFF).toLong)
              i += 1
            }
            meanAbs = if (n == 0) 0L else sum / n
            sawData = true
          case _ => () // LIST/INFO/fact/... — skip
        }
        pos = body + size + (size & 1)
      }
      require(sawData, "no data chunk")
      (rate, n, meanAbs)
    }
  }

  /** REAL compressed-audio codec for G.711 A-law WAV (format tag 6):
    * RIFF chunk walk + the exact integer expansion of
    * [[Multimodal.alawDecode]] — [[wavUlaw]]'s European sibling. The
    * mean is over the DECODED samples, so the lossy quantization is
    * part of the oracle-checked value. */
  def wavAlaw: MediaCodec[(Int, Int, Long)] = () => new Session[(Int, Int, Long)] {
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
            require(bb.getShort(body) == 6, "only A-law wav supported")
            channels = bb.getShort(body + 2)
            rate = bb.getInt(body + 4)
            bits = bb.getShort(body + 14)
          case "data" =>
            require(rate > 0, "data chunk before fmt")
            require(bits == 8 && channels == 1, "expect 8-bit mono A-law")
            n = size
            var i = 0; var sum = 0L
            while (i < n) {
              sum += math.abs(Multimodal.alawDecode(bytes(body + i) & 0xFF).toLong)
              i += 1
            }
            meanAbs = if (n == 0) 0L else sum / n
            sawData = true
          case _ => () // LIST/INFO/fact/... — skip
        }
        pos = body + size + (size & 1)
      }
      require(sawData, "no data chunk")
      (rate, n, meanAbs)
    }
  }

  /** REAL lossless compressed audio: FLAC (RFC 9639 subset — see
    * [[Flac]] for the spec coverage). Returns (rate, decoded samples);
    * `Flac.decode` verifies sync, header CRC-8, frame CRC-16 and the
    * STREAMINFO audio MD5, so a successful return IS the bit-exact
    * lossless proof, not a tolerance band. */
  def flac: MediaCodec[(Int, Array[Int])] =
    () => new Session[(Int, Array[Int])] {
      def decode(bytes: Array[Byte]): (Int, Array[Int]) = Flac.decode(bytes)
    }

  /** Stereo FLAC: (rate, channels) with the side assignments already
    * reconstructed to L/R — see [[Flac.decodeChannels]]. */
  def flacStereo: MediaCodec[(Int, Array[Array[Int]])] =
    () => new Session[(Int, Array[Array[Int]])] {
      def decode(bytes: Array[Byte]): (Int, Array[Array[Int]]) =
        Flac.decodeChannels(bytes)
    }

  /** Animated PNG: (w, h, frames, (delayNum, delayDen)) — see
    * [[Apng.decode]]. */
  def apng: MediaCodec[(Int, Int, Seq[Array[Int]], (Int, Int))] =
    () => new Session[(Int, Int, Seq[Array[Int]], (Int, Int))] {
      def decode(bytes: Array[Byte]): (Int, Int, Seq[Array[Int]], (Int, Int)) =
        Apng.decode(bytes)
    }

  /** REAL lossless compressed image: QOI (qoiformat.org spec — see
    * [[Qoi]]). Returns (w, h, row-major 0xRRGGBB pixels). QOI carries
    * no CRC, so the decoder enforces the structural surface (magic,
    * exact pixel count, end marker) and the CALLER proves losslessness
    * by comparing decoded pixels to the source — the same
    * decode-equals-source discipline as [[flac]]. */
  def qoi: MediaCodec[(Int, Int, Array[Int])] =
    () => new Session[(Int, Int, Array[Int])] {
      def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = Qoi.decode(bytes)
    }

  /** REAL interchange image format: PNG (W3C spec — see [[Png]]).
    * Returns (w, h, row-major 0xRRGGBB pixels). PNG has CRC-32 on
    * every chunk, so the decoder VERIFIES integrity (like [[flac]]'s
    * CRCs, unlike [[qoi]]'s none) on top of the structural surface;
    * the caller proves losslessness by decoded==source. */
  def png: MediaCodec[(Int, Int, Array[Int])] =
    () => new Session[(Int, Int, Array[Int])] {
      def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = Png.decode(bytes)
    }

  /** REAL modern compressed image: lossless WebP (VP8L — LZ77 +
    * canonical Huffman + subtract-green + color cache, see [[Webp]]),
    * the largest crawl image format implementable pure-JVM. No
    * checksum in the format, so the caller proves losslessness by
    * decoded==source like QOI/BMP. */
  def webp: MediaCodec[(Int, Int, Array[Int])] =
    () => new Session[(Int, Int, Array[Int])] {
      def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = Webp.decode(bytes)
    }

  /** REAL uncompressed interchange image: 24-bpp Windows BMP (see
    * [[Bmp]]) — raw padded BGR rows behind a little-endian header,
    * the image analogue of [[wavPcm]]. No CRC in the format, so the
    * caller proves losslessness by decoded==source. */
  def bmp: MediaCodec[(Int, Int, Array[Int])] =
    () => new Session[(Int, Int, Array[Int])] {
      def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = Bmp.decode(bytes)
    }

  /** REAL icon container: ICO (see [[Ico]]) — a directory whose
    * entries are DIB planes or whole PNG streams, so one payload
    * exercises both decode arms. Returns every entry. */
  def ico: MediaCodec[Seq[(Int, Int, Array[Int], String)]] =
    () => new Session[Seq[(Int, Int, Array[Int], String)]] {
      def decode(bytes: Array[Byte]): Seq[(Int, Int, Array[Int], String)] =
        Ico.decode(bytes)
    }

  def wavAdpcm: MediaCodec[(Int, Int, Array[Short])] =
    () => new Session[(Int, Int, Array[Short])] {
      def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
        require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
          "payload is not RIFF/WAVE")
        var pos = 12
        var rate = -1; var blockAlign = -1; var spb = -1
        var factN = -1
        var out: Array[Short] = null
        while (pos + 8 <= bytes.length) {
          val id = tag(pos)
          val size = bb.getInt(pos + 4)
          val body = pos + 8
          id match {
            case "fmt " =>
              require(bb.getShort(body) == 0x11, "not IMA ADPCM (fmt 0x11)")
              require(bb.getShort(body + 2) == 1, "expect mono")
              rate = bb.getInt(body + 4)
              blockAlign = bb.getShort(body + 12)
              require(bb.getShort(body + 14) == 4, "expect 4-bit nibbles")
              spb = if (size >= 20) bb.getShort(body + 18)
                    else 1 + 2 * (blockAlign - 4)
            case "fact" => factN = bb.getInt(body)
            case "data" =>
              require(rate > 0, "data chunk before fmt")
              val nBlocks = size / blockAlign
              val buf = new Array[Short](nBlocks * spb)
              var b = 0; var w = 0
              while (b < nBlocks) {
                val base = body + b * blockAlign
                val pred = bb.getShort(base).toInt
                val idx = bytes(base + 2) & 0xff
                require(idx <= 88, s"corrupt step index $idx")
                val st = new ImaAdpcm.State(pred, idx)
                buf(w) = pred.toShort; w += 1
                var s = 1
                while (s < spb) {
                  val byte = bytes(base + 4 + (s - 1) / 2) & 0xff
                  val nib = if (((s - 1) & 1) == 0) byte & 0x0f else byte >> 4
                  buf(w) = st.decode(nib).toShort; w += 1
                  s += 1
                }
                b += 1
              }
              out = buf
            case _ => ()
          }
          pos = body + size + (size & 1)
        }
        require(out != null, "no data chunk")
        // the fact chunk carries the true count (the last block may be
        // logically short)
        val n = if (factN >= 0 && factN <= out.length) factN else out.length
        (rate, n, out.take(n))
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

  /** REAL compressed-video frame-sampling for MJPEG-in-AVI — a
    * hand-rolled RIFF/AVI chunk walker (the container format is public
    * and byte-exact) feeding every `every`-th `00dc` frame through the
    * JDK's real JPEG decoder. Returns (width, height, total frames,
    * sampled frames, mean luma over sampled pixels) like
    * [[y4mFrameSample]], with the container's declared `avih`
    * dimensions cross-checked against every decoded frame. MJPEG is a
    * genuinely compressed video format (intra-frame JPEG, the
    * capture/interchange codec), so the remaining video stub is
    * INTER-frame codecs (h264/vp9) only, which need native libs this
    * environment does not ship — see [[stub]]. */
  def aviMjpegFrameSample(every: Int): MediaCodec[(Int, Int, Int, Int, Long)] =
    () => {
      javax.imageio.ImageIO.setUseCache(false)
      new Session[(Int, Int, Int, Int, Long)] {
        // One JPEG ImageReader per session: every 00dc chunk is JPEG by
        // format definition, so the per-frame ImageIO.read format sniff
        // and reader construction are pure overhead. Same JDK decoder,
        // identical pixels.
        private val jpegReader =
          javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
        private def readJpegFrame(bytes: Array[Byte], off: Int,
                                  len: Int): java.awt.image.BufferedImage = {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes, off, len))
          try {
            jpegReader.setInput(iis, true, true)
            jpegReader.read(0)
          } finally iis.close()
        }
        def decode(bytes: Array[Byte]): (Int, Int, Int, Int, Long) = {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
          require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
            "payload is not RIFF/AVI")
          var declW = -1; var declH = -1
          var frames = 0; var sampled = 0; var sum = 0L
          var outW = -1; var outH = -1
          def walk(from: Int, to: Int): Unit = {
            var pos = from
            while (pos + 8 <= to) {
              val id = tag(pos)
              val size = bb.getInt(pos + 4)
              val body = pos + 8
              require(body + size <= to, s"truncated $id chunk")
              id match {
                case "LIST" => walk(body + 4, body + size) // recurse past type
                case "avih" =>
                  declW = bb.getInt(body + 32); declH = bb.getInt(body + 36)
                case "00dc" =>
                  if (frames % every == 0) {
                    val img = readJpegFrame(bytes, body, size)
                    require(img != null, "frame is not a decodable JPEG")
                    val (w, h) = (img.getWidth, img.getHeight)
                    require(outW < 0 || (w == outW && h == outH),
                      "inconsistent frame dimensions")
                    outW = w; outH = h
                    sum += Multimodal.redSum(img)
                    sampled += 1
                  }
                  frames += 1
                case _ => () // strh/strf/idx1/JUNK/... — skip
              }
              pos = body + size + (size & 1)
            }
          }
          walk(12, bytes.length)
          require(frames > 0, "no video frames")
          require(declW == outW && declH == outH,
            s"avih dims ${declW}x$declH != decoded ${outW}x$outH")
          (outW, outH, frames, sampled,
            if (sampled == 0) 0L else sum / (sampled.toLong * outW * outH))
        }
      }
    }

  /** REAL animated-GIF frame-sampling through the JDK's multi-image
    * ImageReader surface (`getNumImages` / `read(i)`) — a different
    * decode API than the hand-rolled container walkers: the CONTAINER
    * parsing (frame directory, LZW decompression, palette) is the
    * JDK's, not ours. Same contract as [[y4mFrameSample]] /
    * [[aviMjpegFrameSample]]: every `every`-th frame decodes,
    * returning (width, height, total frames, sampled frames, mean
    * luma over sampled pixels). One reused reader per session. */
  def gifFrameSample(every: Int): MediaCodec[(Int, Int, Int, Int, Long)] =
    () => {
      javax.imageio.ImageIO.setUseCache(false)
      new Session[(Int, Int, Int, Int, Long)] {
        private val reader =
          javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        def decode(bytes: Array[Byte]): (Int, Int, Int, Int, Long) = {
          require(bytes.length >= 6 &&
            new String(bytes, 0, 4, "US-ASCII") == "GIF8",
            "payload is not a GIF")
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, false, true)
            val frames = reader.getNumImages(true)
            require(frames > 0, "no frames")
            var sampled = 0; var sum = 0L
            var outW = -1; var outH = -1
            var f = 0
            while (f < frames) {
              if (f % every == 0) {
                val img = reader.read(f)
                require(outW < 0 ||
                  (img.getWidth == outW && img.getHeight == outH),
                  "inconsistent frame dimensions")
                outW = img.getWidth; outH = img.getHeight
                sum += Multimodal.redSum(img)
                sampled += 1
              }
              f += 1
            }
            (outW, outH, frames, sampled,
              if (sampled == 0) 0L else sum / (sampled.toLong * outW * outH))
          } finally iis.close()
        }
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
        (tw, th, Multimodal.redSum(r) / (tw.toLong * th))
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
        (w, h, Multimodal.redSum(img) / (w.toLong * h))
      }
    }
  }
}
