package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property coverage for the BMP/ICO codecs beyond BmpIcoSpec's fixed
  * cases: random dimensions and pixel content must round-trip exactly
  * (both codecs are lossless by construction), the top-down BMP
  * transform must be pixel-equivalent, and random truncation must
  * REJECT rather than mis-decode (the hardened-header contract). */
object BmpIcoProps extends Properties("BmpIco") {

  private val genDims: Gen[(Int, Int)] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 24)
  } yield (w, h)

  private def genPixels(n: Int): Gen[Array[Int]] =
    Gen.containerOfN[Array, Int](n, Gen.choose(0, 0xFFFFFF))

  property("BMP round-trips random images exactly") =
    Prop.forAll(genDims.flatMap { case (w, h) =>
      genPixels(w * h).map(px => (w, h, px)) }) { case (w, h, px0) =>
      // shrinking ignores generator invariants — re-normalize
      val px = if (px0.length == w * h) px0
        else Array.tabulate(w * h)(i => px0(i % math.max(1, px0.length)) & 0xFFFFFF)
      val (dw, dh, out) = Bmp.decode(Bmp.encode(w, h, px))
      (dw == w && dh == h && out.sameElements(px)) :| s"dims ${w}x$h"
    }

  property("top-down BMP (negated height, reversed rows) decodes to " +
    "the identical row-major pixels") =
    Prop.forAll(genDims.flatMap { case (w, h) =>
      genPixels(w * h).map(px => (w, h, px)) }) { case (w, h, px0) =>
      val px = if (px0.length == w * h) px0
        else Array.tabulate(w * h)(i => px0(i % math.max(1, px0.length)) & 0xFFFFFF)
      val enc = Bmp.encode(w, h, px)
      val rowB = (w * 3 + 3) & ~3
      val td = enc.clone()
      java.nio.ByteBuffer.wrap(td)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -h)
      for (r <- 0 until h)
        System.arraycopy(enc, 54 + (h - 1 - r) * rowB, td, 54 + r * rowB, rowB)
      val (_, _, out) = Bmp.decode(td)
      out.sameElements(px) :| s"dims ${w}x$h"
    }

  property("truncated BMP streams reject (never mis-decode)") =
    Prop.forAll(genDims.flatMap { case (w, h) =>
      genPixels(w * h).map(px => (w, h, px)) }, Gen.choose(0.0, 1.0)) {
      case ((w, h, px0), frac) =>
        val px = if (px0.length == w * h) px0
          else Array.tabulate(w * h)(i => px0(i % math.max(1, px0.length)) & 0xFFFFFF)
        val enc = Bmp.encode(w, h, px)
        val keep = (enc.length * frac).toInt.min(enc.length - 1)
        val cut = java.util.Arrays.copyOf(enc, keep)
        Prop.throws(classOf[IllegalArgumentException])(Bmp.decode(cut))
    }

  private val genEntries: Gen[List[Ico.Entry]] = Gen.choose(1, 4).flatMap {
    n => Gen.listOfN(n, for {
      (w, h) <- genDims
      px <- genPixels(w * h)
      png <- Gen.oneOf(true, false)
    } yield Ico.Entry(w, h, px, png))
  }

  property("ICO round-trips random mixed DIB/PNG directories exactly, " +
    "in order, with the forms the encoder chose") =
    Prop.forAll(genEntries) { es0 =>
      val es = es0.filter(e => e.pixels.length == e.width * e.height)
      (es.nonEmpty) ==> {
        val out = Ico.decode(Ico.encode(es))
        (out.length == es.length) :| "entry count" &&
          out.zip(es).zipWithIndex.forall { case (((w, h, px, form), e), i) =>
            w == e.width && h == e.height && px.sameElements(e.pixels) &&
              form == (if (e.asPng) "png" else "dib")
          } :| "per-entry pixels/forms"
      }
    }
}
