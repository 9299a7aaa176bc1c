package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class BmpIcoSpec extends AnyFunSuite {

  private def img(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i * 37) % 256 << 16) |
      ((i * 11) % 256 << 8) | (i * 5) % 256)

  test("BMP round-trips every 4-byte row-padding residue (widths " +
      "1..9) and the 1x1 edge") {
    for (w <- 1 to 9; h <- Seq(1, 3, 8)) {
      val src = img(w, h)
      val (dw, dh, px) = Bmp.decode(Bmp.encode(w, h, src))
      assert((dw, dh) === (w, h), s"dims for ${w}x$h")
      assert(px.sameElements(src), s"pixels for ${w}x$h")
    }
  }

  test("BMP decodes TOP-DOWN (negative biHeight) streams to the same " +
      "row-major pixels") {
    val (w, h) = (5, 4)
    val src = img(w, h)
    val enc = Bmp.encode(w, h, src)
    val rowB = (w * 3 + 3) & ~3
    // rebuild as top-down: negate height, reverse the row blocks
    val td = enc.clone()
    val bb = java.nio.ByteBuffer.wrap(td)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -h)
    for (r <- 0 until h)
      System.arraycopy(enc, 54 + (h - 1 - r) * rowB, td, 54 + r * rowB, rowB)
    val (dw, dh, px) = Bmp.decode(td)
    assert((dw, dh) === (w, h))
    assert(px.sameElements(src))
  }

  test("BMP rejects forged streams instead of mis-decoding them") {
    val ok = Bmp.encode(4, 4, img(4, 4))
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = ok.clone(); b(off) = v; b
    }
    intercept[IllegalArgumentException](Bmp.decode(mut(0, 'X'.toByte)))
    intercept[IllegalArgumentException](Bmp.decode(mut(28, 32))) // bpp
    intercept[IllegalArgumentException](Bmp.decode(mut(30, 1)))  // RLE
    intercept[IllegalArgumentException](Bmp.decode(ok.take(20)))
    // pixel array pushed past EOF
    val far = ok.clone()
    java.nio.ByteBuffer.wrap(far).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, ok.length - 5)
    intercept[IllegalArgumentException](Bmp.decode(far))
  }

  test("ICO round-trips mixed DIB + PNG entries (including the " +
      "256-maps-to-byte-0 directory encoding) and reports each form") {
    val a = img(7, 5); val b = img(3, 3); val c = img(256, 1)
    val bytes = Ico.encode(Seq(
      Ico.Entry(7, 5, a, asPng = false),
      Ico.Entry(3, 3, b, asPng = true),
      Ico.Entry(256, 1, c, asPng = false)))
    val out = Ico.decode(bytes)
    assert(out.map(e => (e._1, e._2, e._4)) ===
      Seq((7, 5, "dib"), (3, 3, "png"), (256, 1, "dib")))
    assert(out(0)._3.sameElements(a))
    assert(out(1)._3.sameElements(b))
    assert(out(2)._3.sameElements(c))
  }

  test("ICO rejects cursors, bad reserved fields, out-of-bounds " +
      "entries and directories that lie about image dimensions") {
    val ok = Ico.encode(Seq(Ico.Entry(4, 4, img(4, 4), asPng = false)))
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = ok.clone(); b(off) = v; b
    }
    intercept[IllegalArgumentException](Ico.decode(mut(2, 2))) // CUR type
    intercept[IllegalArgumentException](Ico.decode(mut(0, 1))) // reserved
    intercept[IllegalArgumentException](Ico.decode(mut(6, 9))) // dir width 9 != 4
    // payload size past EOF
    val far = ok.clone()
    java.nio.ByteBuffer.wrap(far).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(6 + 8, ok.length) // entry 0 size = whole file (offset 22 > 0)
    intercept[IllegalArgumentException](Ico.decode(far))
    intercept[IllegalArgumentException](
      Ico.encode(Seq(Ico.Entry(257, 4, new Array[Int](257 * 4), asPng = false))))
    intercept[IllegalArgumentException](Ico.encode(Seq.empty))
  }

  test("a DIB entry's doubled-height invariant is enforced (odd " +
      "biHeight rejects)") {
    val ok = Ico.encode(Seq(Ico.Entry(4, 4, img(4, 4), asPng = false)))
    val bad = ok.clone()
    val payloadOff = java.nio.ByteBuffer.wrap(ok)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(6 + 12)
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(payloadOff + 8, 7) // biHeight: 8 -> 7
    intercept[IllegalArgumentException](Ico.decode(bad))
  }
}
