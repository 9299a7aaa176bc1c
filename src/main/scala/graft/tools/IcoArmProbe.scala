package graft.tools

/** Per-arm timing split for the ICO codec (r10 verdict item 5): the
  * sf1→sf2 step read 2.12× for mm_image_ico at 2× rows where BMP read
  * 1.61×, and the suspicion is the PNG-arm entries (a full PNG encode
  * + CRC'd decode per icon) dominating. Each ICO gate row encodes ONE
  * DIB entry and ONE PNG entry over the same pixels; this probe times
  * the two arms separately, single-threaded, at two row counts, so
  * the scaling log can attribute the step to an arm and test
  * super-linearity without Spark scheduling noise.
  *
  * Usage: IcoArmProbe [n] [reps]  (default 50000 ids, 3 reps; prints
  * one JSON line per (arm, count) with best-of-reps seconds).
  */
object IcoArmProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    var sink = 0L
    def run(count: Int, png: Boolean): Double = {
      var best = Double.MaxValue
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        var id = 0L
        while (id < count) {
          val (w, h, src) = graft.multimodal.Qoi.testImage(id)
          val entries = graft.multimodal.Ico.decode(
            graft.multimodal.Ico.encode(Seq(
              graft.multimodal.Ico.Entry(w, h, src, asPng = png))))
          sink += entries.head._3(0)
          id += 1
        }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    // warmup: JIT both arms before any timed leg
    run(math.max(1, n / 10), png = false)
    run(math.max(1, n / 10), png = true)
    Seq(n, 2 * n).foreach { count =>
      Seq("dib" -> false, "png" -> true).foreach { case (arm, png) =>
        val sec = run(count, png)
        println(s"""{"probe":"ico_arm","arm":"$arm","ids":$count,""" +
          s""""sec":$sec,"reps":$reps}""")
      }
    }
    System.err.println(s"sink=$sink")
  }
}
