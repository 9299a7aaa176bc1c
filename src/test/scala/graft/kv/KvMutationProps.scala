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

/** Batch-CAS semantics under random interleavings: unconditional puts,
  * deletes, and checkAndPut batches whose per-row expectations are a
  * random mix of correct (model-current), stale, and null (if-absent)
  * — the engine's applied-count and final table must match a
  * driver-side map model applying the same null-safe rule. */
object KvCheckAndPutProps extends Properties("KvTable.checkAndPut") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = KvSchema.of("k", "v" -> ("f", "v"))

  private sealed trait Op
  private case class Put(rows: Map[String, String]) extends Op
  private case class Del(keys: Set[String]) extends Op
  /** keys to attempt; `mode` per key: 0 = expect current (from the
    * model at apply time), 1 = expect a stale/wrong value, 2 = expect
    * absent (null). */
  private case class Cas(attempts: Map[String, Int]) extends Op

  private val genKey: Gen[String] = Gen.choose(0, 4).map(i => s"k$i")
  private val genOp: Gen[Op] = Gen.frequency(
    3 -> (for {
      n <- Gen.choose(1, 3)
      ks <- Gen.listOfN(n, genKey)
      vs <- Gen.listOfN(n, Gen.oneOf("p", "q", "r"))
    } yield Put(ks.zip(vs).toMap)),
    1 -> Gen.nonEmptyListOf(genKey).map(ks => Del(ks.toSet)),
    4 -> (for {
      n <- Gen.choose(1, 4)
      ks <- Gen.listOfN(n, genKey)
      ms <- Gen.listOfN(n, Gen.choose(0, 2))
    } yield Cas(ks.zip(ms).toMap)))

  property("CAS batches agree with the map model on applied count and " +
    "final state") = Prop.forAll(Gen.listOfN(6, genOp)) { ops0 =>
    val ops = Put(Map("k0" -> "init")) :: ops0
    val path = TestSpark.scratch("prop-cas")
    var model = Map.empty[String, String]
    var ok = true
    ops.foreach {
      case Put(rows) =>
        KvTable.write(rows.toSeq.toDF("k", "v"), path, schema)
        model ++= rows
      case Del(keys) =>
        KvTable.delete(keys.toSeq.toDF("k"), path, schema)
        model --= keys
      case Cas(attempts) =>
        // build the update batch: proposed value + expectation per mode
        val rows = attempts.toSeq.map { case (k, mode) =>
          val expected: String = mode match {
            case 0 => model.getOrElse(k, null) // current (absent -> null)
            case 1 => "stale!"                 // never a stored value
            case _ => null                     // if-absent form
          }
          (k, s"cas-$k", expected)
        }
        val applied = KvTable.checkAndPut(
          rows.toDF("k", "v", "exp"), path, schema, "v",
          org.apache.spark.sql.functions.col("exp"))
        val expectApplied = attempts.count { case (k, mode) =>
          mode match {
            case 0 => true // expectation matches current by construction
            case 1 => false
            case _ => !model.contains(k)
          }
        }
        ok &&= applied == expectApplied
        model ++= attempts.collect {
          case (k, 0) => k -> s"cas-$k"
          case (k, 2) if !model.contains(k) => k -> s"cas-$k"
        }
    }
    val got = KvTable.read(spark, path).as[(String, String)].collect().toMap
    (ok && got == model) :| s"engine=$got model=$model ops=$ops"
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
