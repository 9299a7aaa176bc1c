package graft.multimodal

/** Hand-rolled Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  * 24-bpp uncompressed) from the public file-format spec — the
  * interchange format every OS ships, and the uncompressed-image
  * analogue of [[Multimodal]]'s WAV/PCM: raw pixels behind a little-
  * endian header, so losslessness is provable byte-for-byte.
  *
  * Encoder: bottom-up rows (positive biHeight, the canonical form),
  * BGR byte order, each row padded to a 4-byte boundary. Decoder:
  * accepts bottom-up AND top-down (negative biHeight) streams, any
  * bfOffBits ≥ 54 (headers larger than BITMAPINFOHEADER locate pixels
  * via the offset, per spec), and REJECTS structurally invalid input
  * — wrong magic, non-24-bpp, compressed (biCompression != 0), pixel
  * array out of file bounds — with long-arithmetic bounds checks (the
  * [[Png]] header-hardening discipline: width*height*3 must not be
  * trusted in 32-bit space).
  *
  * Reference behavior mapped: the reference pipes opaque byte columns
  * (`HBaseScheme.java` bytes⇄fields); this codec is part of the EXT
  * multimodal surface built on top of that column model.
  */
object Bmp {

  private val HeaderSize = 14 + 40

  /** Row stride in bytes for a 24-bpp row of `width` pixels. */
  private def stride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode row-major 0xRRGGBB pixels as a bottom-up 24-bpp BMP. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad dimensions ${width}x$height for ${pixels.length} pixels")
    val rowB = stride(width)
    require(rowB.toLong * height + HeaderSize <= Int.MaxValue,
      "image too large for a single BMP")
    val out = new Array[Byte](HeaderSize + rowB * height)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(out.length) // bfSize
    bb.putInt(0)          // bfReserved1/2
    bb.putInt(HeaderSize) // bfOffBits
    bb.putInt(40)         // biSize
    bb.putInt(width)
    bb.putInt(height)     // positive: bottom-up
    bb.putShort(1)        // biPlanes
    bb.putShort(24)       // biBitCount
    bb.putInt(0)          // BI_RGB
    bb.putInt(rowB * height) // biSizeImage
    bb.putInt(2835)       // 72 dpi
    bb.putInt(2835)
    bb.putInt(0)          // biClrUsed
    bb.putInt(0)          // biClrImportant
    var y = height - 1
    var off = HeaderSize
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        out(off) = (p & 0xFF).toByte           // B
        out(off + 1) = ((p >>> 8) & 0xFF).toByte  // G
        out(off + 2) = ((p >>> 16) & 0xFF).toByte // R
        x += 1; off += 3
      }
      off += rowB - width * 3 // padding bytes stay zero
      y -= 1
    }
    out
  }

  /** Decode a 24-bpp uncompressed BMP to (w, h, row-major 0xRRGGBB).
    * Bottom-up and top-down streams both normalize to row-major. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= HeaderSize, "truncated BMP header")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP stream")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offBits = bb.getInt(10)
    val biSize = bb.getInt(14)
    require(biSize >= 40, s"unsupported DIB header size $biSize")
    val width = bb.getInt(18)
    val rawHeight = bb.getInt(22)
    require(bb.getShort(26) == 1, "biPlanes must be 1")
    require(bb.getShort(28) == 24, "only 24-bpp BMP supported")
    require(bb.getInt(30) == 0, "only uncompressed (BI_RGB) supported")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    // all bounds in LONG space — a forged header must not wrap
    val rowB = ((width.toLong * 3 + 3) & ~3L)
    require(offBits >= HeaderSize &&
      offBits.toLong + rowB * height <= bytes.length,
      "pixel array out of file bounds")
    require(width.toLong * height <= Int.MaxValue / 4,
      "pixel count overflows")
    val px = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcY = if (topDown) row else height - 1 - row
      var off = offBits + (srcY.toLong * rowB).toInt
      var x = 0
      while (x < width) {
        px(row * width + x) =
          ((bytes(off + 2) & 0xFF) << 16) |
            ((bytes(off + 1) & 0xFF) << 8) |
            (bytes(off) & 0xFF)
        x += 1; off += 3
      }
      row += 1
    }
    (width, height, px)
  }
}
