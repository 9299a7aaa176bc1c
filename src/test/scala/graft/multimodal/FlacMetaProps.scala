package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property breadth over FlacMetaSpec's fixed cases: random signals,
  * random seek-table densities and random cue sheets must (1) round-
  * trip through readMeta exactly, (2) keep the sequential decode
  * lossless (metadata never perturbs audio), and (3) make decodeAt's
  * suffix equal the full decode's tail from EVERY seek point and from
  * arbitrary between-point targets. */
object FlacMetaProps extends Properties("FlacMeta") {

  private val genSignal: Gen[Array[Short]] = for {
    n <- Gen.choose(65, 1200)
    phase <- Gen.choose(0, 1000)
    amp <- Gen.choose(100, 12000)
  } yield Array.tabulate(n)(i =>
    ((math.sin((i + phase) * 0.07) * amp).toInt + (i % 11) * 7).toShort)

  private val genCue: Gen[List[Flac.CueTrack]] = for {
    k <- Gen.choose(0, 4)
    nums <- Gen.pick(k, 1 to 99)
    offs <- Gen.listOfN(k, Gen.choose(0L, 64L))
  } yield nums.toList.sorted.zip(offs.scanLeft(0L)(_ + _).tail.sorted)
    .map { case (n, o) => Flac.CueTrack(o, n) }

  property("metadata round-trips and never perturbs the audio") =
    Prop.forAll(genSignal, Gen.choose(1, 6), genCue) { (s, every, cue0) =>
      val cue = cue0.filter(_.offsetSamples < s.length)
      val bytes = Flac.encodeWithMeta(8000, s, seekEveryFrames = every,
        cueTracks = cue, catalog = "CAT", leadIn = 2L)
      val m = Flac.readMeta(bytes)
      val frames = (s.length + 63) / 64
      val expectPts = (0L until frames.toLong by every.toLong)
        .map(_ * 64).toSeq
      val (rate, out) = Flac.decode(bytes)
      (m.seekPoints.map(_.sampleNumber) == expectPts) :| "seek points" &&
        (m.cueTracks.map(t => (t.offsetSamples, t.number)) ==
          (if (cue.isEmpty) Nil // no cue -> no CUESHEET block at all
           else cue.map(t => (t.offsetSamples, t.number)) :+
             (s.length.toLong, Flac.LeadOutTrack))) :| "cue tracks" &&
        (rate == 8000 && out.sameElements(s.map(_.toInt))) :| "lossless"
    }

  property("decodeAt from every seek point and from between-point " +
    "targets equals the full decode's suffix") =
    Prop.forAll(genSignal, Gen.choose(1, 6), Gen.choose(0.0, 1.0)) {
      (s, every, frac) =>
        val bytes = Flac.encodeWithMeta(8000, s, seekEveryFrames = every)
        val m = Flac.readMeta(bytes)
        val full = s.map(_.toInt)
        val allPoints = m.seekPoints.forall { p =>
          val (_, from, out) = Flac.decodeAt(bytes, p.sampleNumber)
          from == p.sampleNumber &&
            out(0).sameElements(full.drop(p.sampleNumber.toInt))
        }
        val target = (s.length * frac).toLong.min(s.length - 1L)
        val expectFrom = m.seekPoints.filter(_.sampleNumber <= target)
          .lastOption.map(_.sampleNumber).getOrElse(0L)
        val (_, from2, out2) = Flac.decodeAt(bytes, target)
        allPoints :| "every seek point" &&
          (from2 == expectFrom &&
            out2(0).sameElements(full.drop(from2.toInt))) :| "between points"
    }
}
