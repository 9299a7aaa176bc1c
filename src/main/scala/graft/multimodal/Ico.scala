package graft.multimodal

/** Windows ICO container from the public spec — a directory of icon
  * images where each entry is EITHER a BMP-style DIB (BITMAPINFOHEADER
  * with DOUBLED height covering the XOR color plane plus a 1-bpp AND
  * transparency mask) or a whole PNG stream (the post-Vista form,
  * detected by signature). The [[Apng]] pattern again: a container
  * grammar layered over codecs already in the repo, so one file
  * exercises two decode arms against the same source pixels.
  *
  * Encoder constraints enforced: 1–65535 entries, each 1–256 px a
  * side (ICONDIRENTRY stores dimensions as one byte, 0 meaning 256).
  * Decoder validations: reserved/type fields, per-entry payload
  * bounds, DIB doubled-height consistency, and the ICONDIRENTRY
  * dimension bytes must MATCH the decoded image (a directory that
  * lies about its images is rejected, not trusted).
  */
object Ico {

  /** One icon image: pixels plus the container form to store it in. */
  final case class Entry(width: Int, height: Int, pixels: Array[Int],
                         asPng: Boolean)

  private def dimByte(v: Int): Byte = (if (v == 256) 0 else v).toByte

  /** DIB payload: BITMAPINFOHEADER (biHeight doubled), bottom-up
    * 24-bpp XOR rows padded to 4 bytes, then an all-opaque 1-bpp AND
    * mask (rows padded to 4 bytes). */
  private def dibPayload(e: Entry): Array[Byte] = {
    val xorRow = (e.width * 3 + 3) & ~3
    val andRow = ((e.width + 7) / 8 + 3) & ~3
    val out = new Array[Byte](40 + (xorRow + andRow) * e.height)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40)
    bb.putInt(e.width)
    bb.putInt(e.height * 2) // XOR + AND planes, per spec
    bb.putShort(1)
    bb.putShort(24)
    bb.putInt(0)
    bb.putInt((xorRow + andRow) * e.height)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    var y = e.height - 1
    var off = 40
    while (y >= 0) {
      var x = 0
      while (x < e.width) {
        val p = e.pixels(y * e.width + x)
        out(off) = (p & 0xFF).toByte
        out(off + 1) = ((p >>> 8) & 0xFF).toByte
        out(off + 2) = ((p >>> 16) & 0xFF).toByte
        x += 1; off += 3
      }
      off += xorRow - e.width * 3
      y -= 1
    }
    // AND mask: all zero bits = fully opaque (already zeroed)
    out
  }

  def encode(entries: Seq[Entry]): Array[Byte] = {
    require(entries.nonEmpty && entries.length <= 0xFFFF,
      "an icon needs 1..65535 entries")
    entries.foreach { e =>
      require(e.width >= 1 && e.width <= 256 &&
        e.height >= 1 && e.height <= 256,
        s"icon entries are 1..256 px a side, got ${e.width}x${e.height}")
      require(e.pixels.length == e.width * e.height, "bad pixel count")
    }
    val payloads = entries.map { e =>
      if (e.asPng) Png.encode(e.width, e.height, e.pixels) else dibPayload(e)
    }
    val dirSize = 6 + 16 * entries.length
    val out = new java.io.ByteArrayOutputStream(
      dirSize + payloads.map(_.length).sum)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16(v >>> 16) }
    u16(0) // reserved
    u16(1) // ICO type
    u16(entries.length)
    var offset = dirSize
    entries.lazyZip(payloads).foreach { (e, p) =>
      out.write(dimByte(e.width)); out.write(dimByte(e.height))
      out.write(0) // palette size (true color)
      out.write(0) // reserved
      u16(1) // planes
      u16(if (e.asPng) 32 else 24)
      u32(p.length)
      u32(offset)
      offset += p.length
    }
    payloads.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  /** Decode every entry to (w, h, row-major 0xRRGGBB, "png"|"dib"). */
  def decode(bytes: Array[Byte]): Seq[(Int, Int, Array[Int], String)] = {
    require(bytes.length >= 6, "truncated ICONDIR")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getShort(0) == 0, "ICONDIR reserved field must be 0")
    require(bb.getShort(2) == 1, "not an ICO stream (type != 1)")
    val count = bb.getShort(4) & 0xFFFF
    require(count >= 1, "empty icon directory")
    require(bytes.length >= 6 + 16 * count, "truncated icon directory")
    (0 until count).map { i =>
      val ent = 6 + 16 * i
      val dw = { val b = bytes(ent) & 0xFF; if (b == 0) 256 else b }
      val dh = { val b = bytes(ent + 1) & 0xFF; if (b == 0) 256 else b }
      val size = bb.getInt(ent + 8)
      val off = bb.getInt(ent + 12)
      require(size > 0 && off >= 6 + 16 * count &&
        off.toLong + size <= bytes.length,
        s"entry $i payload out of file bounds")
      val isPng = size >= Png.PngSignature.length &&
        Png.PngSignature.indices.forall(j =>
          bytes(off + j) == Png.PngSignature(j))
      val (w, h, px, form) =
        if (isPng) {
          val p = java.util.Arrays.copyOfRange(bytes, off, off + size)
          val (pw, ph, ppx) = Png.decode(p)
          (pw, ph, ppx, "png")
        } else decodeDib(bytes, off, size, i)
      require(w == dw && h == dh,
        s"entry $i directory says ${dw}x$dh but image is ${w}x$h")
      (w, h, px, form)
    }
  }

  private def decodeDib(bytes: Array[Byte], off: Int, size: Int,
                        i: Int): (Int, Int, Array[Int], String) = {
    require(size >= 40, s"entry $i DIB truncated")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(off) == 40, s"entry $i unsupported DIB header")
    val width = bb.getInt(off + 4)
    val dblH = bb.getInt(off + 8)
    require(width > 0 && dblH > 0 && dblH % 2 == 0,
      s"entry $i DIB height must be the doubled XOR+AND height")
    val height = dblH / 2
    require(bb.getShort(off + 12) == 1, s"entry $i biPlanes must be 1")
    require(bb.getShort(off + 14) == 24, s"entry $i only 24-bpp DIB")
    require(bb.getInt(off + 16) == 0, s"entry $i only uncompressed DIB")
    val xorRow = ((width.toLong * 3 + 3) & ~3L)
    val andRow = (((width.toLong + 7) / 8 + 3) & ~3L)
    require(40L + (xorRow + andRow) * height <= size,
      s"entry $i pixel planes out of payload bounds")
    val px = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcY = height - 1 - row // DIB plane is bottom-up
      var o = off + 40 + (srcY * xorRow).toInt
      var x = 0
      while (x < width) {
        px(row * width + x) =
          ((bytes(o + 2) & 0xFF) << 16) |
            ((bytes(o + 1) & 0xFF) << 8) |
            (bytes(o) & 0xFF)
        x += 1; o += 3
      }
      row += 1
    }
    (width, height, px, "dib")
  }
}
