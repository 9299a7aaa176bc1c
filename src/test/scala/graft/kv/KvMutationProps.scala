package graft.kv

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark

/** Stateful fuzz for the accumulating mutation kinds: RANDOM sequences
  * of increment/append batches, key deletes, major compactions and
  * (lossless) minor compactions must leave [[KvCounter]]/[[KvAppend]]
  * agreeing with trivial in-memory models. Pins the interplay the
  * single-op specs can't reach: tombstone masking across arbitrary
  * batch interleavings, compactions landing anywhere in the sequence
  * (including back-to-back and before any delete), and the version
  * counter surviving materialization.
  */
object KvCounterProps extends Properties("KvCounter.lifecycle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private sealed trait Op
  private case class Inc(rows: List[(String, Long)]) extends Op
  private case class Del(keys: Set[String]) extends Op
  private case object Compact extends Op
  private case object Minor extends Op

  private val genKey: Gen[String] = Gen.choose(0, 4).map(i => s"k$i")
  private val genOp: Gen[Op] = Gen.frequency(
    5 -> (for {
      n <- Gen.choose(1, 4)
      ks <- Gen.listOfN(n, genKey)
      ds <- Gen.listOfN(n, Gen.choose(-5L, 9L))
    } yield Inc(ks.zip(ds))),
    2 -> Gen.nonEmptyListOf(genKey).map(ks => Del(ks.toSet)),
    1 -> Gen.const(Compact),
    2 -> Gen.const(Minor))

  /** (version, key, Some(delta) | None=tombstone); batch versions 1.. */
  private case class Model(log: Vector[(Long, String, Option[Long])],
                           lastVer: Long) {
    private def tombMax(k: String): Long =
      log.collect { case (v, `k`, None) => v }.maxOption.getOrElse(0L)
    private def surviving: Vector[(Long, String, Long)] =
      log.collect { case (v, k, Some(d)) if v > tombMax(k) => (v, k, d) }
    def values: Map[String, Long] =
      surviving.groupBy(_._2).map { case (k, es) => k -> es.map(_._3).sum }
    def apply(op: Op): Model = op match {
      case Inc(rows) =>
        val v = lastVer + 1
        Model(log ++ rows.map { case (k, d) => (v, k, Some(d)) }, v)
      case Del(keys) =>
        val v = lastVer + 1
        Model(log ++ keys.map(k => (v, k, Option.empty[Long])), v)
      case Minor => this // physically lossless
      case Compact =>
        val keep = surviving.groupBy(_._2).map { case (k, es) =>
          (es.map(_._1).max, k, Option(es.map(_._3).sum))
        }.toVector
        Model(keep, lastVer)
    }
  }

  private def applyReal(path: String, op: Op): Unit = op match {
    case Inc(rows) =>
      KvCounter.increment(rows.toDF("k", "delta"), path, "k")
    case Del(keys) =>
      if (KvTable.exists(spark, path))
        KvCounter.delete(keys.toSeq.toDF("k"), path)
    case Compact =>
      if (KvTable.exists(spark, path)) KvCounter.compact(spark, path)
    case Minor =>
      if (KvTable.exists(spark, path))
        KvTable.compactMinor(spark, path, smallFileBytes = Long.MaxValue)
  }

  property("op sequences agree with the delta-log model") =
    Prop.forAll(Gen.listOfN(5, genOp)) { ops0 =>
      val ops = Inc(List("k0" -> 1L)) :: ops0
      val path = TestSpark.scratch("prop-counter")
      var m = Model(Vector.empty, 0L)
      ops.foreach { op => applyReal(path, op); m = m.apply(op) }
      val got = KvCounter.read(spark, path)
        .as[(String, Long)].collect().toMap
      (got == m.values) :| s"engine=$got model=${m.values} ops=$ops"
    }
}

/** Same harness for [[KvAppend]]: at most ONE fragment per key per
  * batch (within-batch multi-fragment order is seq-tie-undefined, the
  * documented HBase-racing-appends contract — the fuzz pins the
  * DEFINED behavior). */
object KvAppendProps extends Properties("KvAppend.lifecycle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private sealed trait Op
  private case class App(rows: Map[String, String]) extends Op
  private case class Del(keys: Set[String]) extends Op
  private case object Compact extends Op
  private case object Minor extends Op

  private val genKey: Gen[String] = Gen.choose(0, 4).map(i => s"k$i")
  private val genOp: Gen[Op] = Gen.frequency(
    5 -> (for {
      n <- Gen.choose(1, 4)
      ks <- Gen.listOfN(n, genKey)
      vs <- Gen.listOfN(n, Gen.oneOf("a", "b", "cd", "e!"))
    } yield App(ks.zip(vs).toMap)),
    2 -> Gen.nonEmptyListOf(genKey).map(ks => Del(ks.toSet)),
    1 -> Gen.const(Compact),
    2 -> Gen.const(Minor))

  /** (version, key, Some(frag) | None=tombstone). */
  private case class Model(log: Vector[(Long, String, Option[String])],
                           lastVer: Long) {
    private def tombMax(k: String): Long =
      log.collect { case (v, `k`, None) => v }.maxOption.getOrElse(0L)
    private def surviving: Vector[(Long, String, String)] =
      log.collect { case (v, k, Some(f)) if v > tombMax(k) => (v, k, f) }
    def values: Map[String, String] =
      surviving.groupBy(_._2).map { case (k, es) =>
        k -> es.sortBy(_._1).map(_._3).mkString
      }
    def apply(op: Op): Model = op match {
      case App(rows) =>
        val v = lastVer + 1
        Model(log ++ rows.map { case (k, f) => (v, k, Some(f)) }, v)
      case Del(keys) =>
        val v = lastVer + 1
        Model(log ++ keys.map(k => (v, k, Option.empty[String])), v)
      case Minor => this
      case Compact =>
        val keep = values.map { case (k, joined) =>
          val ver = surviving.filter(_._2 == k).map(_._1).max
          (ver, k, Option(joined))
        }.toVector
        Model(keep, lastVer)
    }
  }

  private def applyReal(path: String, op: Op): Unit = op match {
    case App(rows) =>
      KvAppend.appendTo(rows.toSeq.toDF("k", "piece"), path, "k")
    case Del(keys) =>
      if (KvTable.exists(spark, path))
        KvAppend.delete(keys.toSeq.toDF("k"), path)
    case Compact =>
      if (KvTable.exists(spark, path)) KvAppend.compact(spark, path)
    case Minor =>
      if (KvTable.exists(spark, path))
        KvTable.compactMinor(spark, path, smallFileBytes = Long.MaxValue)
  }

  property("op sequences agree with the fragment-log model") =
    Prop.forAll(Gen.listOfN(5, genOp)) { ops0 =>
      val ops = App(Map("k0" -> "init")) :: ops0
      val path = TestSpark.scratch("prop-append")
      var m = Model(Vector.empty, 0L)
      ops.foreach { op => applyReal(path, op); m = m.apply(op) }
      val got = KvAppend.read(spark, path)
        .as[(String, String)].collect().toMap
      (got == m.values) :| s"engine=$got model=${m.values} ops=$ops"
    }
}
