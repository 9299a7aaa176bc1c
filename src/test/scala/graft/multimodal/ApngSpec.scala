package graft.multimodal

import java.util.zip.{Adler32, CRC32}

import org.scalatest.funsuite.AnyFunSuite

/** APNG pins, following the PngSpec discipline: a KNOWN-ANSWER
  * animation hand-assembled from the spec (stored-mode zlib,
  * independent CRCs — a matched encoder/decoder bug cannot hide), the
  * sequence-number defense, the "an APNG is a valid PNG" property,
  * and round trips across frame counts. */
class ApngSpec extends AnyFunSuite {

  // --- independent stream-assembly helpers (not the encoder's) -----
  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32()
    crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
    be32(data.length.toLong) ++ tpe.getBytes("US-ASCII") ++ data ++
      be32(crc.getValue)
  }
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val adler = new Adler32(); adler.update(raw)
    val len = raw.length
    Array(0x78.toByte, 0x01.toByte, 0x01.toByte,
      (len & 0xFF).toByte, ((len >> 8) & 0xFF).toByte,
      (~len & 0xFF).toByte, ((~len >> 8) & 0xFF).toByte) ++
      raw ++ be32(adler.getValue)
  }
  private val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)
  private def fctl(seq: Long, w: Int, h: Int): Array[Byte] =
    chunk("fcTL", be32(seq) ++ be32(w.toLong) ++ be32(h.toLong) ++
      be32(0) ++ be32(0) ++ be16(2) ++ be16(25) ++ Array[Byte](0, 0))

  /** 2x2 two-frame known-answer animation: frame 0 all filter-None
    * rows of (1,2,3)(4,5,6)/(7,8,9)(10,11,12); frame 1 the same +16.
    * Every byte placed by hand from the spec. */
  private def kaApng(): (Array[Byte], Seq[Seq[Int]]) = {
    val f0raw = Array[Byte](0, 1, 2, 3, 4, 5, 6, 0, 7, 8, 9, 10, 11, 12)
    val f1raw = f0raw.zipWithIndex.map { case (v, i) =>
      if (i % 7 == 0) v else (v + 16).toByte } // keep filter bytes 0
    val bytes = sig ++
      chunk("IHDR", be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("acTL", be32(2) ++ be32(0)) ++
      fctl(0, 2, 2) ++
      chunk("IDAT", zlibStored(f0raw)) ++
      fctl(1, 2, 2) ++
      chunk("fdAT", be32(2) ++ zlibStored(f1raw)) ++
      chunk("IEND", Array.emptyByteArray)
    val f0 = Seq(0x010203, 0x040506, 0x070809, 0x0A0B0C)
    val f1 = f0.map(p => p + 0x101010)
    (bytes, Seq(f0, f1))
  }

  test("decodes the hand-assembled known-answer animation (stored " +
      "zlib, independent CRCs, split across IDAT + fdAT)") {
    val (bytes, expected) = kaApng()
    val (w, h, frames, delay) = Apng.decode(bytes)
    assert((w, h) === (2, 2))
    assert(frames.length === 2)
    assert(frames(0).toSeq === expected(0))
    assert(frames(1).toSeq === expected(1))
    assert(delay === (2, 25))
  }

  test("an APNG is a valid PNG: Png.decode sees the default image " +
      "(frame 0) and skips the ancillary animation chunks") {
    val (bytes, expected) = kaApng()
    val (w, h, px) = Png.decode(bytes)
    assert((w, h) === (2, 2))
    assert(px.toSeq === expected(0))
  }

  test("round trip across frame counts, including multi-fdAT-sized " +
      "frames and delay preservation") {
    for (n <- Seq(1, 2, 5)) {
      val w = 13; val h = 9
      val frames = (0 until n).map(k =>
        Array.tabulate(w * h)(i => ((i * 7 + k * 31) % 0x1000000)))
      val enc = Apng.encode(w, h, frames, delayNum = 3, delayDen = 50)
      val (dw, dh, dec, delay) = Apng.decode(enc)
      assert((dw, dh) === (w, h))
      assert(dec.length === n)
      (0 until n).foreach(k => assert(dec(k).toSeq === frames(k).toSeq, s"frame $k"))
      assert(delay === (3, 50))
    }
  }

  test("sequence-number violations reject: a swapped fcTL seq and a " +
      "wrong fdAT seq both fail, CRC-valid") {
    val f0raw = Array[Byte](0, 1, 2, 3, 4, 5, 6, 0, 7, 8, 9, 10, 11, 12)
    def stream(fctl1Seq: Long, fdatSeq: Long) = sig ++
      chunk("IHDR", be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("acTL", be32(2) ++ be32(0)) ++
      fctl(0, 2, 2) ++
      chunk("IDAT", zlibStored(f0raw)) ++
      fctl(fctl1Seq, 2, 2) ++
      chunk("fdAT", be32(fdatSeq) ++ zlibStored(f0raw)) ++
      chunk("IEND", Array.emptyByteArray)
    val e1 = intercept[IllegalArgumentException](Apng.decode(stream(2, 1)))
    assert(e1.getMessage.contains("sequence"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Apng.decode(stream(1, 7)))
    assert(e2.getMessage.contains("sequence"), e2.getMessage)
  }

  test("structural animation rejections: declared-count mismatch, " +
      "fdAT before the second fcTL, plain PNG without acTL") {
    val f0raw = Array[Byte](0, 1, 2, 3, 4, 5, 6, 0, 7, 8, 9, 10, 11, 12)
    val ihdr = chunk("IHDR", be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0))
    val declared3 = sig ++ ihdr ++
      chunk("acTL", be32(3) ++ be32(0)) ++
      fctl(0, 2, 2) ++ chunk("IDAT", zlibStored(f0raw)) ++
      fctl(1, 2, 2) ++ chunk("fdAT", be32(2) ++ zlibStored(f0raw)) ++
      chunk("IEND", Array.emptyByteArray)
    val e1 = intercept[IllegalArgumentException](Apng.decode(declared3))
    assert(e1.getMessage.contains("declared"), e1.getMessage)
    val orphanFdat = sig ++ ihdr ++
      chunk("acTL", be32(2) ++ be32(0)) ++
      fctl(0, 2, 2) ++ chunk("IDAT", zlibStored(f0raw)) ++
      chunk("fdAT", be32(1) ++ zlibStored(f0raw)) ++
      chunk("IEND", Array.emptyByteArray)
    val e2 = intercept[IllegalArgumentException](Apng.decode(orphanFdat))
    assert(e2.getMessage.contains("fcTL"), e2.getMessage)
    val plain = Png.encode(2, 2, Array(1, 2, 3, 4))
    val e3 = intercept[IllegalArgumentException](Apng.decode(plain))
    assert(e3.getMessage.contains("acTL"), e3.getMessage)
  }

  test("a flipped fdAT byte is detected by the chunk CRC") {
    val (bytes, _) = kaApng()
    // find the fdAT chunk and flip a data byte inside it
    var pos = 8
    var off = -1
    while (off < 0) {
      val len = ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      if (new String(bytes, pos + 4, 4, "US-ASCII") == "fdAT") off = pos + 8 + 6
      else pos += 12 + len
    }
    val bad = bytes.clone()
    bad(off) = (bad(off) ^ 0x20).toByte
    val e = intercept[IllegalArgumentException](Apng.decode(bad))
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }
}
