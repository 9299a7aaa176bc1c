package graft.tools

/** Per-arm scaling probe for the two round-11 codec queries the r11
  * verdict flagged for the probe ledger (item 8): mm_audio_seek
  * (FLAC encode-with-seektable vs seek-decode) and mm_image_webp
  * (VP8L encode vs decode). Times each arm single-threaded at n and
  * 2n ids (best-of-reps), so a superlinear sf step can be attributed
  * to an arm without Spark scheduling noise — the IcoArmProbe
  * pattern.
  *
  * Usage: MediaArmProbe [n] [reps] (default 20000 ids, 3 reps).
  */
object MediaArmProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    var sink = 0L

    def srcFor(id: Long): (Int, Int, Array[Short]) = {
      val len = 960 + (id % 4).toInt * 64
      val rate = 8000 + (id % 8).toInt * 1000
      val src = Array.tabulate(len) { i =>
        if (id % 4 == 0 && i < 64) 512.toShort
        else (((id * 31 + i.toLong * i * 7) % 4096) - 2048).toShort
      }
      (len, rate, src)
    }

    def best(f: () => Long): Double = {
      var b = Double.MaxValue
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        sink += f()
        b = math.min(b, (System.nanoTime() - t0) / 1e9)
      }
      b
    }

    def flacEncode(count: Int): Long = {
      var acc = 0L; var id = 0L
      while (id < count) {
        val (_, rate, src) = srcFor(id)
        acc += graft.multimodal.Flac
          .encodeWithMeta(rate, src, seekEveryFrames = 4).length
        id += 1
      }
      acc
    }
    def flacSeek(count: Int): Long = {
      var acc = 0L; var id = 0L
      while (id < count) {
        val (len, rate, src) = srcFor(id)
        val bytes = graft.multimodal.Flac
          .encodeWithMeta(rate, src, seekEveryFrames = 4)
        val target = (id * 131) % (len - 64)
        val (_, first, chans) = graft.multimodal.Flac.decodeAt(bytes, target)
        acc += first + chans(0).length
        id += 1
      }
      acc
    }
    def webpEncode(count: Int): Long = {
      var acc = 0L; var id = 0L
      while (id < count) {
        val (w, h, src) = graft.multimodal.Qoi.testImage(id)
        acc += graft.multimodal.Webp.encode(w, h, src).length
        id += 1
      }
      acc
    }
    def webpDecode(count: Int): Long = {
      var acc = 0L; var id = 0L
      while (id < count) {
        val (w, h, src) = graft.multimodal.Qoi.testImage(id)
        val bytes = graft.multimodal.Webp.encode(w, h, src)
        val (_, _, px) = graft.multimodal.Webp.decode(bytes)
        acc += px.length
        id += 1
      }
      acc
    }

    // warmup (JIT) before any timed leg
    Seq(flacEncode _, flacSeek _, webpEncode _, webpDecode _)
      .foreach(f => f(math.max(1, n / 10)))

    val arms = Seq(
      ("flac_encode_meta", flacEncode _),
      ("flac_seek_decode", flacSeek _),
      ("webp_encode", webpEncode _),
      ("webp_decode", webpDecode _))
    Seq(n, 2 * n).foreach { count =>
      arms.foreach { case (arm, f) =>
        val sec = best(() => f(count))
        println(s"""{"probe":"media_arm","arm":"$arm","ids":$count,""" +
          s""""sec":$sec,"reps":$reps}""")
      }
    }
    System.err.println(s"sink=$sink")
  }
}
