package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** VP8L (lossless WebP) codec: exact round trips over the shared test
  * image, an independent token walker proving every coding tool the
  * encoder claims (literals, LZ77 copies, color-cache hits) actually
  * occurs in the emitted streams, overlapping-copy and degenerate-tree
  * edges, deterministic encode, and the loud-rejection boundary for
  * container lies and out-of-subset features. */
class WebpSpec extends AnyFunSuite {

  test("round-trips the shared test image exactly across the id family") {
    (0L until 400L).foreach { id =>
      val (w, h, src) = Qoi.testImage(id)
      val (dw, dh, px) = Webp.decode(Webp.encode(w, h, src))
      assert(dw === w && dh === h, s"id=$id dims")
      assert(px.sameElements(src), s"id=$id pixels differ")
    }
  }

  test("the emitted streams exercise literals, LZ77 copies AND cache " +
      "hits (coverage proven by the decoder's token walker, not hoped " +
      "for — the QoiSpec discipline)") {
    var lits = 0L; var copies = 0L; var hits = 0L
    (0L until 200L).foreach { id =>
      val (w, h, src) = Qoi.testImage(id)
      val (_, _, _, (l, c, ch)) =
        Webp.decodeWithStats(Webp.encode(w, h, src))
      lits += l; copies += c; hits += ch
    }
    assert(lits > 0, "no literals emitted")
    assert(copies > 0, "no LZ77 backward references emitted — the " +
      "codec's central coding tool is dead weight")
    assert(hits > 0, "no color-cache hits emitted")
  }

  test("overlapping backward reference (dist 1 over a constant run) " +
      "reconstructs exactly — the RLE-via-LZ77 case") {
    val px = Array.fill(64)(0x123456)
    val (w, h, out) = Webp.decode(Webp.encode(8, 8, px))
    assert(w === 8 && h === 8 && out.sameElements(px))
  }

  test("degenerate images: 1x1 (single literal, 0-bit trees) and 1x3 " +
      "(cache-hit path without any possible LZ77 match)") {
    val one = Array(0xABCDEF)
    val (w1, h1, o1) = Webp.decode(Webp.encode(1, 1, one))
    assert(w1 === 1 && h1 === 1 && o1.sameElements(one))
    val three = Array(0x102030, 0x102030, 0x102030)
    val (w3, h3, o3) = Webp.decode(Webp.encode(3, 1, three))
    assert(w3 === 3 && h3 === 1 && o3.sameElements(three))
  }

  test("encode is deterministic (byte-identical across calls)") {
    val (w, h, src) = Qoi.testImage(7L)
    assert(Webp.encode(w, h, src).sameElements(Webp.encode(w, h, src)))
  }

  test("container lies reject loudly") {
    val (w, h, src) = Qoi.testImage(3L)
    val enc = Webp.encode(w, h, src)
    // not RIFF
    intercept[IllegalArgumentException](Webp.decode("x".getBytes ++ enc.drop(1)))
    // lossy VP8 chunk instead of VP8L
    val lossy = enc.clone()
    lossy(15) = ' '.toByte
    intercept[IllegalArgumentException](Webp.decode(lossy))
    // trailing garbage breaks the RIFF size contract
    intercept[IllegalArgumentException](Webp.decode(enc ++ Array[Byte](0, 0)))
    // every truncation point dies on the container size check
    Seq(4, 12, 19, enc.length / 2, enc.length - 1).foreach { keep =>
      intercept[IllegalArgumentException](
        Webp.decode(java.util.Arrays.copyOf(enc, keep)))
    }
    // forged version bits (payload bits 37..39 = byte 24 bits 5..7)
    val vers = enc.clone()
    vers(24) = (vers(24) | 0xE0).toByte
    intercept[IllegalArgumentException](Webp.decode(vers))
  }

  test("out-of-subset features reject NAMING the feature, never decode " +
      "wrong pixels: a stream announcing the predictor transform") {
    // hand-build the VP8L prefix: RIFF/WEBP/VP8L wrapper around a
    // payload that announces transform type 0 (PREDICTOR)
    val bits = new scala.collection.mutable.ArrayBuffer[Int]()
    def put(v: Int, n: Int): Unit = (0 until n).foreach(i => bits += ((v >> i) & 1))
    put(0x2F, 8); put(7, 14); put(7, 14) // 8x8
    put(0, 1); put(0, 3)                 // alpha hint, version 0
    put(1, 1); put(0, 2)                 // transform present: type 0
    val payload = bits.grouped(8).map(g =>
      g.zipWithIndex.foldLeft(0)((a, bi) => a | (bi._1 << bi._2)).toByte).toArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes); val sz = 4 + 8 + payload.length + (payload.length & 1)
    out.write(Array[Byte]((sz & 0xFF).toByte, ((sz >> 8) & 0xFF).toByte,
      ((sz >> 16) & 0xFF).toByte, ((sz >> 24) & 0xFF).toByte))
    out.write("WEBP".getBytes); out.write("VP8L".getBytes)
    out.write(Array[Byte]((payload.length & 0xFF).toByte,
      ((payload.length >> 8) & 0xFF).toByte, 0, 0))
    out.write(payload); if ((payload.length & 1) == 1) out.write(0)
    val ex = intercept[IllegalArgumentException](Webp.decode(out.toByteArray))
    assert(ex.getMessage.contains("not supported"),
      s"rejection must name the unsupported feature: ${ex.getMessage}")
  }
}
