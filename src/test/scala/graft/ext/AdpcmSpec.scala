package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaCodec, Multimodal}

/** IMA-ADPCM codec contract: the encoder fixture and the real decoder
  * share one state machine, so these tests pin the SPEC behaviors a
  * foreign payload would exercise (header state, nibble order, fact
  * truncation, word alignment) and MEASURE the reconstruction bound
  * the `mm_audio_adpcm` gate boolean relies on. */
class AdpcmSpec extends AnyFunSuite {

  private def roundTrip(rate: Int, src: Array[Short]) = {
    val codec = MediaCodec.wavAdpcm.open()
    codec.decode(Multimodal.makeAdpcmWav(rate, src))
  }

  test("constant signal at the header predictor reproduces EXACTLY") {
    // diff 0 quantizes to nibble 0; at step index 0 the reconstruction
    // delta (step >> 3 = 0) vanishes, so the predictor never moves.
    val src = Array.fill(100)(1234.toShort)
    val (rate, n, out) = roundTrip(16000, src)
    assert(rate === 16000 && n === 100)
    assert(out.toSeq === src.toSeq)
  }

  test("first sample is always exact (it travels in the block header)") {
    for (s0 <- Seq(Short.MinValue, -1.toShort, 0.toShort, Short.MaxValue)) {
      val (_, _, out) = roundTrip(8000, Array(s0, 100, -100))
      assert(out(0) === s0)
    }
  }

  test("odd sample counts round-trip (fact chunk truncates the pad nibble)") {
    val src = Array.tabulate(65)(i => (i * 40 - 1200).toShort)
    val (_, n, out) = roundTrip(8000, src)
    assert(n === 65 && out.length === 65)
  }

  test("payload byte size matches the oracle's arithmetic") {
    for (n <- Seq(64, 65, 100, 127)) {
      val src = Array.tabulate(n)(i => (i * 7).toShort)
      val bytes = Multimodal.makeAdpcmWav(8000, src)
      val nb = n / 2
      assert(bytes.length === 60 + 4 + nb + nb % 2,
        s"n=$n: got ${bytes.length}")
    }
  }

  test("the query's signal family tracks within HALF the gate bound") {
    // mm_audio_adpcm gates maxErr <= 256 over triangle waves with
    // slope 16/32/48 and phase 0..6; measure the family's true worst
    // case over a dense id sweep and require 2x headroom, so the gate
    // cannot sit on a knife edge.
    var worst = 0
    for (id <- 0L until 4000L) {
      val n = 64 + (id % 64).toInt
      val d = 16 * (1 + (id % 3).toInt)
      val a = 1024
      val src = Array.tabulate(n) { i =>
        val t = (((id % 7) + i) * d % (4 * a)).toInt
        (a - math.abs(t - 2 * a)).toShort
      }
      val (_, ns, out) = roundTrip(8000, src)
      assert(ns === n)
      var i = 0
      while (i < n) {
        worst = math.max(worst, math.abs(out(i) - src(i))); i += 1
      }
    }
    assert(worst <= 128, s"family worst-case error $worst exceeds half the gate bound")
    assert(worst > 0, "a lossy codec with zero error on ramps means the measurement is broken")
  }

  test("decoder honours RIFF word alignment and skips unknown chunks") {
    // splice a LIST chunk with an odd payload length between fmt and
    // data; a walker that forgets the pad byte misreads everything after
    val src = Array.tabulate(64)(i => (i * 50).toShort)
    val good = Multimodal.makeAdpcmWav(8000, src)
    val bb = java.nio.ByteBuffer.wrap(good).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fmtEnd = 12 + 8 + 20
    val inject = java.nio.ByteBuffer.allocate(8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    inject.put("LIST".getBytes("US-ASCII")); inject.putInt(3)
    inject.put(Array[Byte](1, 2, 3, 0)) // 3 bytes + pad
    val spliced = java.nio.ByteBuffer
      .allocate(good.length + 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spliced.put(good, 0, fmtEnd)
    spliced.put(inject.array())
    spliced.put(good, fmtEnd, good.length - fmtEnd)
    val arr = spliced.array()
    // fix the RIFF size field
    bb.getInt(4) // (original)
    java.nio.ByteBuffer.wrap(arr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, arr.length - 8)
    val codec = MediaCodec.wavAdpcm.open()
    val (rate, n, out) = codec.decode(arr)
    val (_, _, ref) = roundTrip(8000, src)
    assert(rate === 8000 && n === 64 && out.toSeq === ref.toSeq)
  }
}
