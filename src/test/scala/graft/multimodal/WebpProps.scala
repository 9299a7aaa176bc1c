package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property coverage for the VP8L codec beyond WebpSpec's fixed cases:
  * random dimensions and pixel content round-trip exactly (the format
  * is lossless by construction, whatever mix of literals / copies /
  * cache hits the tokenizer picks), low-entropy content (few distinct
  * colors — the regime that drives deep LZ77/cache usage and
  * degenerate Huffman trees) round-trips too, and random truncation
  * REJECTS rather than mis-decodes. */
object WebpProps extends Properties("Webp") {

  private val genDims: Gen[(Int, Int)] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 24)
  } yield (w, h)

  private def norm(px0: Array[Int], n: Int): Array[Int] =
    if (px0.length == n) px0.map(_ & 0xFFFFFF)
    else Array.tabulate(n)(i => px0(i % math.max(1, px0.length)) & 0xFFFFFF)

  property("round-trips random images exactly") =
    Prop.forAll(genDims.flatMap { case (w, h) =>
      Gen.containerOfN[Array, Int](w * h, Gen.choose(0, 0xFFFFFF))
        .map(px => (w, h, px)) }) { case (w, h, px0) =>
      val px = norm(px0, w * h)
      val (dw, dh, out) = Webp.decode(Webp.encode(w, h, px))
      (dw == w && dh == h && out.sameElements(px)) :| s"dims ${w}x$h"
    }

  property("round-trips low-entropy images (<=4 colors) exactly") =
    Prop.forAll(genDims, Gen.containerOfN[Array, Int](4, Gen.choose(0, 0xFFFFFF)),
      Gen.choose(0, Int.MaxValue)) { case ((w, h), palette0, seed) =>
      val palette = if (palette0.isEmpty) Array(0) else palette0
      val px = Array.tabulate(w * h)(i =>
        palette(((seed.toLong + i * 2654435761L) % palette.length).toInt.abs
          % palette.length) & 0xFFFFFF)
      val (dw, dh, out) = Webp.decode(Webp.encode(w, h, px))
      (dw == w && dh == h && out.sameElements(px)) :| s"dims ${w}x$h"
    }

  property("truncated streams reject (never mis-decode)") =
    Prop.forAll(genDims.flatMap { case (w, h) =>
      Gen.containerOfN[Array, Int](w * h, Gen.choose(0, 0xFFFFFF))
        .map(px => (w, h, px)) }, Gen.choose(0.0, 1.0)) {
      case ((w, h, px0), frac) =>
        val px = norm(px0, w * h)
        val enc = Webp.encode(w, h, px)
        val keep = (enc.length * frac).toInt.min(enc.length - 1)
        Prop.throws(classOf[IllegalArgumentException])(
          Webp.decode(java.util.Arrays.copyOf(enc, keep)))
    }
}
