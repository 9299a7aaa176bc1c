package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Qoi

/** QOI codec spec. The known-answer stream is HAND-ASSEMBLED from the
  * public spec (qoiformat.org) — op tags, bit packing and the hash
  * derived independently of the encoder — so a matched
  * encoder/decoder packing bug cannot hide. Round trips then prove
  * losslessness across shapes that exercise every op kind.
  */
class QoiSpec extends AnyFunSuite {

  private def header(w: Int, h: Int): Array[Byte] =
    Array[Byte]('q', 'o', 'i', 'f',
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      3, 0)

  private val endMarker = Array.fill[Byte](7)(0) :+ 1.toByte

  test("hand-assembled known-answer stream decodes exactly " +
      "(RGB, RUN, DIFF, INDEX, LUMA)") {
    // 5x1, pixels: (10,20,30) via RGB; repeat via RUN(1); (11,21,31)
    // via DIFF(+1,+1,+1); (10,20,30) via INDEX — hash = (10*3 + 20*5 +
    // 30*7 + 255*11) % 64 = 3145 % 64 = 9; (25,41,43) via LUMA
    // (dg=21, dr-dg=-6, db-dg=-8).
    val chunks = Array[Byte](
      0xFE.toByte, 10, 20, 30, // QOI_OP_RGB
      0xC0.toByte, // QOI_OP_RUN, length 1
      0x7F.toByte, // QOI_OP_DIFF (1,1,1) -> 01 11 11 11
      0x09.toByte, // QOI_OP_INDEX slot 9
      0xB5.toByte, 0x20.toByte) // QOI_OP_LUMA dg=21; (dr-dg+8)<<4 | (db-dg+8)
    val (w, h, px) = Qoi.decode(header(5, 1) ++ chunks ++ endMarker)
    assert((w, h) === ((5, 1)))
    assert(px.toSeq === Seq(0x0A141E, 0x0A141E, 0x0B151F, 0x0A141E, 0x19292B))
  }

  test("RGBA op carries alpha into the running pixel and the index " +
      "hash (decoder handles 4-channel streams)") {
    val chunks = Array[Byte](
      0xFF.toByte, 1, 2, 3, 0x80.toByte, // RGBA (1,2,3,a=128)
      0xC0.toByte) // RUN 1: same pixel again
    val (w, h, px) = Qoi.decode(
      (header(2, 1).updated(12, 4.toByte): Array[Byte]) ++ chunks ++ endMarker)
    assert((w, h) === ((2, 1)))
    assert(px.toSeq === Seq(0x010203, 0x010203))
  }

  test("round trip is lossless over op-diverse shapes, including the " +
      "query generator's own images") {
    val shapes = Seq((1, 1), (3, 2), (8, 8), (17, 9), (23, 24))
    for (((w, h), k) <- shapes.zipWithIndex) {
      // deterministic pseudo-random-ish pixels: mix runs (every 7th
      // repeats), small deltas and jumps
      val src = Array.tabulate(w * h) { i =>
        if (i % 7 == 3 && i > 0) -1 // marker: copy previous
        else {
          val r = (i * 31 + k * 77) % 256
          val g = (i * 3 + k * 11) % 256
          val b = (i * 113 + k) % 256
          (r << 16) | (g << 8) | b
        }
      }
      for (i <- src.indices if src(i) == -1) src(i) = src(i - 1)
      val (dw, dh, out) = Qoi.decode(Qoi.encode(w, h, src))
      assert((dw, dh) === ((w, h)))
      assert(out.toSeq === src.toSeq, s"shape ${w}x$h")
    }
    // the mm_image_qoi generator itself (Qoi.testImage's four regions)
    for (id <- 0L to 40L) {
      val (w, h, src) = Qoi.testImage(id)
      val (dw, dh, out) = Qoi.decode(Qoi.encode(w, h, src))
      assert((dw, dh) === ((w, h)) && out.sameElements(src), s"id $id")
    }
  }

  test("encoder emits the whole op family on the generator images") {
    // scan tag bytes with an independent mini-walker (lengths only)
    var seen = Set.empty[String]
    for (id <- 0L to 40L) {
      val (w, h, src) = Qoi.testImage(id)
      val bytes = Qoi.encode(w, h, src)
      var p = 14
      while (p < bytes.length - 8) {
        val b1 = bytes(p) & 0xFF
        if (b1 == 0xFE) { seen += "rgb"; p += 4 }
        else if (b1 == 0xFF) { seen += "rgba"; p += 5 }
        else { (b1 >>> 6) match {
          case 0 => seen += "index"; p += 1
          case 1 => seen += "diff"; p += 1
          case 2 => seen += "luma"; p += 2
          case _ => seen += "run"; p += 1
        }}
      }
    }
    assert(Set("rgb", "index", "diff", "luma", "run").subsetOf(seen))
    assert(!seen.contains("rgba")) // encoder is channels=3
  }

  test("structural corruption never decodes silently") {
    val src = Array.tabulate(12)(i => (i * 40 % 256) << 16 | i)
    val good = Qoi.encode(4, 3, src)
    assert(Qoi.decode(good)._3.sameElements(src))
    // bad magic
    intercept[IllegalArgumentException] {
      Qoi.decode(good.updated(0, 'x'.toByte))
    }
    // truncated chunk stream: header + end marker but pixels undecoded
    intercept[IllegalArgumentException] {
      Qoi.decode(good.take(15) ++ good.takeRight(8))
    }
    // trailing garbage before the end marker
    intercept[IllegalArgumentException] {
      Qoi.decode(good.dropRight(8) ++ Array[Byte](0x55) ++ good.takeRight(8))
    }
    // broken end marker
    intercept[IllegalArgumentException] {
      Qoi.decode(good.updated(good.length - 1, 0.toByte))
    }
    // run past the last pixel: 1x1 image with RUN length 2
    intercept[IllegalArgumentException] {
      Qoi.decode(header(1, 1) ++ Array[Byte](0xC1.toByte) ++ endMarker)
    }
  }
}
