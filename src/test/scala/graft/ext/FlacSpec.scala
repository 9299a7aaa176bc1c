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
