package graft.multimodal

/** QOI ("Quite OK Image") — a REAL published lossless image format
  * (qoiformat.org specification, 2022; single-page public spec),
  * implemented pure-JVM from the spec: 14-byte header (magic "qoif",
  * big-endian u32 width/height, u8 channels, u8 colorspace), then a
  * byte stream of six op kinds over a running pixel + a 64-entry
  * recently-seen-color index:
  *
  *   QOI_OP_RUN   11xxxxxx          run of the previous pixel (bias -1,
  *                                  lengths 1..62 — 63/64 collide with
  *                                  the RGB/RGBA tags)
  *   QOI_OP_INDEX 00xxxxxx          index[(3r+5g+7b+11a) % 64]
  *   QOI_OP_DIFF  01drdgdb          per-channel wrapping deltas in [-2,1]
  *   QOI_OP_LUMA  10dddddd, drdb    dg in [-32,31], dr-dg/db-dg in [-8,7]
  *   QOI_OP_RGB   0xFE r g b
  *   QOI_OP_RGBA  0xFF r g b a
  *
  * and an 8-byte end marker (seven 0x00, one 0x01). Unlike PNG/FLAC,
  * QOI carries NO checksum — a mid-stream flip can decode to wrong
  * pixels silently — so the decoder enforces everything the format
  * does give (magic, channel/colorspace range, EXACT pixel count,
  * no stream over/underrun, end marker), and the query layer proves
  * losslessness by comparing decoded pixels to the source formula
  * (the same decode-must-equal-source discipline as mm_audio_flac).
  *
  * Pixels are 0xRRGGBB ints (alpha fixed 255 on encode, channels=3;
  * the DECODER implements the full op set including RGBA and tracks
  * alpha, since real-world QOI streams interleave it).
  */
object Qoi {

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  /** The mm_image_qoi test image (shared by query and spec; the
    * DuckDB oracle mirrors it in SQL): four regions chosen so the
    * encoder provably emits the WHOLE op family —
    * row 0 constant (RUN), row 1 a (+1,+1,+1) ramp (DIFF), row 2
    * alternating two distant colors (INDEX after first sight, RGB for
    * the jumps), rows 3+ three independent gradients (LUMA/RGB). */
  def testImage(id: Long): (Int, Int, Array[Int]) = {
    val w = 8 + (id % 16).toInt
    val h = 8 + ((id * 3) % 16).toInt
    val base = ((id * 37) % 256).toInt
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (y == 0) (base << 16) | (base << 8) | base
      else if (y == 1) {
        val v = (base + x) % 256
        (v << 16) | (v << 8) | v
      } else if (y == 2) {
        if (x % 2 == 0) (base << 16) | (base << 8) | base
        else (((base + 97) % 256) << 16) | (((base + 31) % 256) << 8) |
          ((base + 13) % 256)
      } else {
        val r = (base + 3 * x) % 256
        val g = (base + 11 * y) % 256
        val b = (base + 5 * x + 7 * y) % 256
        (r << 16) | (g << 8) | b
      }
    }
    (w, h, px)
  }

  /** Encode `pixels` (row-major 0xRRGGBB) as channels=3, linear. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad dimensions ${width}x$height for ${pixels.length} pixels")
    val out = new java.io.ByteArrayOutputStream(14 + pixels.length + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
    }
    be32(width); be32(height)
    out.write(3) // channels
    out.write(0) // colorspace: sRGB with linear alpha
    val index = new Array[Int](64) // packed ARGB; 0 == unset (a=0 never equals a=255)
    // prev pixel starts (0,0,0,255) per spec; alpha is 255 throughout
    var pr = 0; var pg = 0; var pb = 0
    var run = 0
    def flushRun(): Unit = if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
    var i = 0
    while (i < pixels.length) {
      val px = pixels(i)
      val r = (px >>> 16) & 0xFF; val g = (px >>> 8) & 0xFF; val b = px & 0xFF
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) flushRun()
      } else {
        flushRun()
        val h = hash(r, g, b, 255)
        val packed = (255 << 24) | (r << 16) | (g << 8) | b
        if (index(h) == packed) {
          out.write(h)
        } else {
          index(h) = packed
          // wrapping signed-byte deltas, per spec
          val dr = ((r - pr + 128) & 0xFF) - 128
          val dg = ((g - pg + 128) & 0xFF) - 128
          val db = ((b - pb + 128) & 0xFF) - 128
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1) {
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          } else {
            val drg = ((dr - dg + 128) & 0xFF) - 128
            val dbg = ((db - dg + 128) & 0xFF) - 128
            if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                dbg >= -8 && dbg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              out.write(0xFE); out.write(r); out.write(g); out.write(b)
            }
          }
        }
      }
      pr = r; pg = g; pb = b
      i += 1
    }
    flushRun()
    var z = 0
    while (z < 7) { out.write(0); z += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Decode a QOI stream: returns (width, height, row-major 0xRRGGBB).
    * Enforces magic, header ranges, exact pixel count, in-bounds
    * reads, and the end marker — the format's full validation surface
    * (QOI has no CRC; content integrity is the caller's comparison). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 22, "truncated: no room for header + end marker")
    require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
      bytes(3) == 'f', "bad magic")
    def be32(off: Int): Int =
      ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
        ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
    val w = be32(4); val h = be32(8)
    val channels = bytes(12) & 0xFF; val colorspace = bytes(13) & 0xFF
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(channels == 3 || channels == 4, s"bad channels $channels")
    require(colorspace <= 1, s"bad colorspace $colorspace")
    val n = w.toLong * h
    require(n <= Int.MaxValue, "pixel count overflow")
    val px = new Array[Int](n.toInt)
    val index = new Array[Int](64) // packed ARGB, zero-initialized per spec
    var r = 0; var g = 0; var b = 0; var a = 255
    var p = 14
    val chunksEnd = bytes.length - 8
    var i = 0
    var run = 0
    while (i < n) {
      if (run > 0) {
        run -= 1
      } else {
        require(p < chunksEnd, "stream underrun: pixels left but no chunks")
        val b1 = bytes(p) & 0xFF; p += 1
        if (b1 == 0xFE) { // RGB
          require(p + 3 <= chunksEnd, "truncated RGB op")
          r = bytes(p) & 0xFF; g = bytes(p + 1) & 0xFF; b = bytes(p + 2) & 0xFF
          p += 3
        } else if (b1 == 0xFF) { // RGBA
          require(p + 4 <= chunksEnd, "truncated RGBA op")
          r = bytes(p) & 0xFF; g = bytes(p + 1) & 0xFF
          b = bytes(p + 2) & 0xFF; a = bytes(p + 3) & 0xFF
          p += 4
        } else (b1 >>> 6) match {
          case 0 => // INDEX
            val v = index(b1 & 0x3F)
            a = (v >>> 24) & 0xFF; r = (v >>> 16) & 0xFF
            g = (v >>> 8) & 0xFF; b = v & 0xFF
          case 1 => // DIFF
            r = (r + ((b1 >>> 4) & 0x3) - 2) & 0xFF
            g = (g + ((b1 >>> 2) & 0x3) - 2) & 0xFF
            b = (b + (b1 & 0x3) - 2) & 0xFF
          case 2 => // LUMA
            require(p < chunksEnd, "truncated LUMA op")
            val b2 = bytes(p) & 0xFF; p += 1
            val dg = (b1 & 0x3F) - 32
            r = (r + dg + ((b2 >>> 4) & 0xF) - 8) & 0xFF
            g = (g + dg) & 0xFF
            b = (b + dg + (b2 & 0xF) - 8) & 0xFF
          case _ => // RUN (b1 <= 0xFD here, so length <= 62 by construction)
            run = b1 & 0x3F
        }
        index(hash(r, g, b, a)) = (a << 24) | (r << 16) | (g << 8) | b
      }
      px(i) = (r << 16) | (g << 8) | b
      i += 1
    }
    require(run == 0, "run past the last pixel")
    require(p == chunksEnd, "trailing chunk bytes before the end marker")
    var z = 0
    while (z < 7) {
      require(bytes(chunksEnd + z) == 0, "bad end marker"); z += 1
    }
    require(bytes(bytes.length - 1) == 1, "bad end marker")
    (w, h, px)
  }
}
