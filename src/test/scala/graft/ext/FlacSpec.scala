package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Flac

/** FLAC codec contract (RFC 9639 subset): a KNOWN-ANSWER stream
  * hand-assembled from the spec (independently of the Scala encoder,
  * via a from-scratch bit/CRC derivation — catches matched encoder/
  * decoder bit-order bugs), exhaustive-ish round trips across frame
  * boundaries and subframe regimes, corruption detection, and the
  * compression sanity the format exists for.
  */
class FlacSpec extends AnyFunSuite {

  test("decodes the hand-assembled known-answer stream (verbatim " +
      "subframe, 8-bit blocksize + kHz rate codes the encoder never emits)") {
    val bytes = Array(
      0x66, 0x4C, 0x61, 0x43, 0x80, 0x00, 0x00, 0x22, 0x00, 0x04, 0x00,
      0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x01, 0xF4, 0x00, 0xF0,
      0x00, 0x00, 0x00, 0x04, 0x01, 0x5B, 0x3A, 0x75, 0x99, 0xFC, 0x89,
      0x44, 0x9A, 0xEF, 0xE5, 0x27, 0x91, 0xD5, 0xF2, 0x1B, 0xFF, 0xF8,
      0x6C, 0x08, 0x00, 0x03, 0x08, 0xB9, 0x02, 0x00, 0x01, 0x00, 0x02,
      0x00, 0x03, 0x00, 0x04, 0x77, 0x18).map(_.toByte)
    val (rate, samples) = Flac.decode(bytes)
    assert(rate === 8000)
    assert(samples.toSeq === Seq(1, 2, 3, 4))
  }

  private def roundTrip(rate: Int, src: Array[Short]): Unit = {
    val enc = Flac.encode(rate, src)
    val (r, out) = Flac.decode(enc)
    assert(r === rate)
    assert(out.toSeq === src.toSeq.map(_.toInt))
  }

  test("round trip across frame boundaries and signal shapes") {
    val rnd = new scala.util.Random(13)
    // lengths straddling the 64-sample blocksize: 1, 63, 64, 65, 128, 200
    Seq(1, 63, 64, 65, 128, 200).foreach { n =>
      roundTrip(8000, Array.fill(n)((rnd.nextInt(65536) - 32768).toShort))
    }
    // constant (CONSTANT subframe), ramp (FIXED-1 zero residual),
    // quadratic (FIXED-2), full-range alternation (escape partitions)
    roundTrip(44100, Array.fill(130)(512.toShort))
    roundTrip(8000, Array.tabulate(130)(i => (i * 7 - 300).toShort))
    roundTrip(8000, Array.tabulate(130)(i => ((i * i) % 2000 - 1000).toShort))
    roundTrip(8000, Array.tabulate(130)(i =>
      if (i % 2 == 0) 32767.toShort else (-32768).toShort))
    // extremes and tiny blocks
    roundTrip(16000, Array[Short](-32768, 32767, 0, -1, 1))
    roundTrip(8000, Array[Short](42))
  }

  test("compression is real: a smooth signal beats raw PCM, noise " +
      "does not explode") {
    val smooth = Array.tabulate(4096)(i => ((i % 512) - 256).toShort)
    val flacBytes = Flac.encode(8000, smooth).length
    assert(flacBytes < 4096 * 2 / 2,
      s"smooth 8 KiB PCM should compress well below half, got $flacBytes")
    val rnd = new scala.util.Random(5)
    val noise = Array.fill(4096)((rnd.nextInt(65536) - 32768).toShort)
    val noisy = Flac.encode(8000, noise).length
    assert(noisy < 4096 * 2 * 12 / 10,
      s"noise must stay near raw size (escape partitions), got $noisy")
  }

  test("stereo round trip is lossless and the encoder genuinely mixes " +
      "channel assignments (independent + at least one side regime)") {
    val n = 300
    val left = Array.tabulate(n)(i => ((i * i * 7) % 4096 - 2048).toShort)
    val right = Array.tabulate(n) { i =>
      if (i < 128) (left(i) - (i % 7 - 3)).toShort // correlated: tiny side
      else (((i * 31 + 11) % 4096) - 2048).toShort // independent
    }
    val enc = Flac.encodeStereo(44100, left, right)
    val (rate, chans) = Flac.decodeChannels(enc)
    assert(rate === 44100)
    assert(chans.length === 2)
    assert(chans(0).toSeq === left.toSeq.map(_.toInt))
    assert(chans(1).toSeq === right.toSeq.map(_.toInt))
    // independent frame walker: assignment codes straight from the
    // stream, not from encoder bookkeeping
    val assigns = Flac.frameAssignments(enc).toSet
    assert(assigns.subsetOf(Set(1, 8, 9, 10)), assigns.toString)
    assert(assigns.contains(1) && assigns.exists(c => c >= 8),
      s"expected mixed regimes, got $assigns")
  }

  test("stereo decorrelation is real compression: identical channels " +
      "code the side as constant zero and beat two mono streams") {
    val n = 512
    val l = Array.tabulate(n)(i => ((i * 13) % 4096 - 2048).toShort)
    val stereo = Flac.encodeStereo(16000, l, l.clone())
    val twoMono = Flac.encode(16000, l).length + Flac.encode(16000, l).length
    assert(stereo.length < twoMono * 3 / 4,
      s"stereo=${stereo.length} twoMono=$twoMono")
  }

  test("the 17-bit side channel survives extreme amplitudes " +
      "(L=32767 vs R=-32768 -> side 65535)") {
    val n = 80
    val left = Array.fill(n)(32767.toShort)
    val right = Array.fill(n)((-32768).toShort)
    val (rate, chans) = Flac.decodeChannels(
      Flac.encodeStereo(8000, left, right))
    assert(rate === 8000)
    assert(chans(0).forall(_ == 32767) && chans(1).forall(_ == -32768))
  }

  test("mono streams decode unchanged through the channel API, and " +
      "decode() rejects stereo input") {
    val src = Array.tabulate(100)(i => ((i * 37) % 1024 - 512).toShort)
    val mono = Flac.encode(8000, src)
    val (r1, chans) = Flac.decodeChannels(mono)
    assert(r1 === 8000 && chans.length === 1)
    assert(chans(0).toSeq === src.toSeq.map(_.toInt))
    val stereo = Flac.encodeStereo(8000, src, src.clone())
    val e = intercept[IllegalArgumentException](Flac.decode(stereo))
    assert(e.getMessage.contains("mono"))
  }

  test("corruption is detected, never silently decoded") {
    val src = Array.tabulate(150)(i => ((i * 31) % 2048 - 1024).toShort)
    val good = Flac.encode(8000, src)
    // flip one bit in a frame body (past the 42-byte header area)
    val bad = good.clone(); bad(50) = (bad(50) ^ 0x10).toByte
    intercept[Exception](Flac.decode(bad))
    // truncation
    intercept[Exception](Flac.decode(good.take(good.length - 3)))
    // not FLAC at all
    intercept[Exception](Flac.decode("RIFFxxxxWAVE".getBytes))
  }

  test("streams above one coded-number byte of frames still decode " +
      "(UTF-8-style frame index)") {
    // 130 frames of 64 samples → frame indexes past 0x7F use the
    // 2-byte coded-number form
    val src = Array.tabulate(130 * 64)(i => ((i * 13) % 1024 - 512).toShort)
    roundTrip(8000, src)
  }
}
