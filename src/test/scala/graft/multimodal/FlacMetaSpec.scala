package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** SEEKTABLE / CUESHEET metadata blocks and seek-table random access
  * (RFC 9639 §8.4–8.5). The contract triangle: (1) metadata-free
  * encode is byte-identical to the plain encoder (existing gates
  * untouched), (2) a stream WITH metadata still fully decodes through
  * the sequential path (unknown-block skipping), (3) decodeAt from
  * every seek point reproduces the exact suffix of the full decode
  * without reading earlier frames. */
class FlacMetaSpec extends AnyFunSuite {

  private def signal(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((math.sin(i * 0.11) * 9000).toInt +
      (i % 7) * 13).toShort)

  test("encodeWithMeta with defaults is BYTE-IDENTICAL to encode") {
    val s = signal(500)
    assert(Flac.encodeWithMeta(8000, s).sameElements(Flac.encode(8000, s)))
    val l = signal(300); val r = signal(300).map(x => (x + 5).toShort)
    assert(Flac.encodeStereoWithMeta(8000, l, r).sameElements(
      Flac.encodeStereo(8000, l, r)))
  }

  test("a stream with SEEKTABLE + CUESHEET still decodes losslessly " +
      "through the sequential path (block skipping + MD5)") {
    val s = signal(777)
    val bytes = Flac.encodeWithMeta(8000, s, seekEveryFrames = 3,
      cueTracks = Seq(Flac.CueTrack(0, 1, "USGRF2400001"),
        Flac.CueTrack(400, 2)),
      catalog = "GRAFT-CAT-001", leadIn = 88200L)
    val (rate, out) = Flac.decode(bytes)
    assert(rate === 8000)
    assert(out.sameElements(s.map(_.toInt)))
  }

  test("readMeta round-trips seek points, catalog, lead-in and cue " +
      "tracks (auto lead-out appended last)") {
    val s = signal(700) // 64-sample frames -> 11 frames
    val bytes = Flac.encodeWithMeta(8000, s, seekEveryFrames = 4,
      cueTracks = Seq(Flac.CueTrack(0, 1, "USGRF2400001"),
        Flac.CueTrack(320, 7)),
      catalog = "GRAFT-CAT-001", leadIn = 88200L)
    val m = Flac.readMeta(bytes)
    assert(m.seekPoints.map(_.sampleNumber) === Seq(0L, 256L, 512L))
    assert(m.seekPoints.forall(_.frameSamples == 64))
    assert(m.catalog === "GRAFT-CAT-001")
    assert(m.leadIn === 88200L)
    assert(m.cueTracks.map(t => (t.offsetSamples, t.number)) ===
      Seq((0L, 1), (320L, 7), (700L, Flac.LeadOutTrack)))
    assert(m.cueTracks.head.isrc === "USGRF2400001")
  }

  test("decodeAt reproduces the exact suffix of the full decode from " +
      "EVERY seek point, mono and stereo, without earlier frames") {
    val l = signal(900); val r = signal(900).map(x => (x - 11).toShort)
    for ((bytes, chans) <- Seq(
      (Flac.encodeWithMeta(8000, l, seekEveryFrames = 2),
        Array(l.map(_.toInt))),
      (Flac.encodeStereoWithMeta(8000, l, r, seekEveryFrames = 5),
        Array(l.map(_.toInt), r.map(_.toInt))))) {
      val m = Flac.readMeta(bytes)
      assert(m.seekPoints.nonEmpty)
      m.seekPoints.foreach { p =>
        val (rate, from, out) = Flac.decodeAt(bytes, p.sampleNumber)
        assert(rate === 8000)
        assert(from === p.sampleNumber)
        out.zip(chans).foreach { case (got, src) =>
          assert(got.sameElements(src.drop(p.sampleNumber.toInt)),
            s"suffix from ${p.sampleNumber}")
        }
      }
      // a target BETWEEN seek points starts at the greatest point <= it
      val mid = m.seekPoints.last.sampleNumber + 32
      val (_, from2, _) = Flac.decodeAt(bytes, mid)
      assert(from2 === m.seekPoints.last.sampleNumber)
    }
  }

  test("decodeAt verifies per-frame integrity: corrupting a byte in " +
      "the decoded suffix rejects, corrupting one BEFORE the seek " +
      "point does not affect the partial decode") {
    val s = signal(900)
    val bytes = Flac.encodeWithMeta(8000, s, seekEveryFrames = 4)
    val m = Flac.readMeta(bytes)
    val p = m.seekPoints.last
    val suffixStart = m.firstFramePos + p.byteOffset.toInt
    // flip a byte inside the suffix (past the frame header region)
    val badSuffix = bytes.clone()
    badSuffix(suffixStart + 8) = (badSuffix(suffixStart + 8) ^ 0x40).toByte
    intercept[Exception](Flac.decodeAt(badSuffix, p.sampleNumber))
    // flip a byte in an EARLIER frame: sequential decode rejects, but
    // the seek-point suffix never reads it
    val badPrefix = bytes.clone()
    badPrefix(m.firstFramePos + 6) = (badPrefix(m.firstFramePos + 6) ^ 0x40).toByte
    intercept[Exception](Flac.decode(badPrefix))
    val (_, _, out) = Flac.decodeAt(badPrefix, p.sampleNumber)
    assert(out(0).sameElements(s.map(_.toInt).drop(p.sampleNumber.toInt)))
  }

  test("forged metadata rejects: seek point off a frame-sync " +
      "boundary, out-of-order seek points, cue sheet without lead-out") {
    val s = signal(500)
    val bytes = Flac.encodeWithMeta(8000, s, seekEveryFrames = 2,
      cueTracks = Seq(Flac.CueTrack(0, 1)))
    val m = Flac.readMeta(bytes)
    // find the SEEKTABLE block and corrupt the second point's offset
    var pos = 4; var stPos = -1
    var last = false
    while (!last && stPos < 0) {
      val h = bytes(pos) & 0xFF
      last = (h & 0x80) != 0
      if ((h & 0x7F) == 3) stPos = pos + 4
      else pos += 4 + (((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF))
    }
    assert(stPos > 0)
    val offAxis = bytes.clone()
    offAxis(stPos + 18 + 15) = (offAxis(stPos + 18 + 15) + 1).toByte // 2nd point byteOffset += 1
    intercept[IllegalArgumentException](Flac.readMeta(offAxis))
    val reordered = bytes.clone()
    // overwrite the 2nd point's sample number (bytes 0..7 of the entry) with 0
    for (i <- 0 until 8) reordered(stPos + 18 + i) = 0
    intercept[IllegalArgumentException](Flac.readMeta(reordered))
    // cue sheet whose lead-out is renumbered: find CUESHEET, last
    // track's number byte = offset of track area depends on layout —
    // easier: the encoder itself must refuse a user track numbered 255
    intercept[IllegalArgumentException](
      Flac.encodeWithMeta(8000, s, cueTracks = Seq(Flac.CueTrack(0, 255))))
  }
}
