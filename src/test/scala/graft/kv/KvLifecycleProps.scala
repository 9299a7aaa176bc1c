package graft.kv

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark

/** Stateful lifecycle property: a RANDOM sequence of table operations
  * (batch upsert, key delete, major compaction, bucketed compaction)
  * must leave the table agreeing with a trivial in-memory log model on
  * the live LWW view, EVERY time-travel snapshot, and point gets.
  *
  * This pins the interplay the single-op specs can't: versions survive
  * compaction (LWW ordering intact in every domain), tombstones are
  * compacted AWAY (so a snapshot AFTER compaction shows the compacted
  * history, not the deleted keys), appends after a bucketed compaction
  * stay bucket-aligned, and the version counter never regresses.
  */
object KvLifecycleProps extends Properties("KvTable.lifecycle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each sample runs many real Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = KvSchema.of("k", "v" -> ("f", "v"))

  private sealed trait Op
  private case class WriteBatch(rows: Map[String, String]) extends Op
  private case class DeleteKeys(keys: Set[String]) extends Op
  private case object Compact extends Op
  private case class CompactBucketed(n: Int) extends Op
  private case object CompactMinor extends Op

  private val genKey: Gen[String] = Gen.choose(0, 5).map(i => s"k$i")

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> (for {
      n <- Gen.choose(1, 4)
      ks <- Gen.listOfN(n, genKey)
      vs <- Gen.listOfN(n, Gen.alphaStr.map(_.take(4)))
    } yield WriteBatch(ks.zip(vs).toMap)),
    2 -> Gen.nonEmptyListOf(genKey).map(ks => DeleteKeys(ks.toSet)),
    1 -> Gen.const(Compact),
    1 -> Gen.choose(2, 4).map(CompactBucketed),
    2 -> Gen.const(CompactMinor)
  )

  /** The in-memory log: (version, key, value-or-tombstone) triples.
    * Compaction replaces it with the live entries (their ORIGINAL
    * versions — the engine's version-preserving contract). */
  private case class Model(log: Vector[(Long, String, Option[String])],
                           lastVer: Long) {
    def live: Map[String, String] = snapshot(Long.MaxValue)
    def snapshot(asOf: Long): Map[String, String] =
      log.zipWithIndex
        .filter { case ((v, _, _), _) => v <= asOf }
        .groupBy(_._1._2)
        .flatMap { case (k, entries) =>
          val ((_, _, value), _) = entries.maxBy { case ((v, _, _), i) => (v, i) }
          value.map(k -> _)
        }
    def apply(op: Op): Model = op match {
      case WriteBatch(rows) =>
        val v = lastVer + 1
        Model(log ++ rows.map { case (k, x) => (v, k, Some(x)) }, v)
      case DeleteKeys(keys) =>
        val v = lastVer + 1
        Model(log ++ keys.map(k => (v, k, Option.empty[String])), v)
      case CompactMinor =>
        // minor compaction is physically LOSSLESS: the model's log —
        // live view, every snapshot, versions — is untouched
        this
      case Compact | CompactBucketed(_) =>
        // live entries keep their versions; tombstones and history drop
        val keep = live.map { case (k, x) =>
          val ver = log.zipWithIndex
            .filter(e => e._1._2 == k && e._1._1 <= lastVer)
            .maxBy { case ((v, _, _), i) => (v, i) }._1._1
          (ver, k, Some(x))
        }.toVector
        Model(keep, lastVer)
    }
  }

  private def applyReal(path: String, op: Op): Unit = op match {
    case WriteBatch(rows) =>
      KvTable.write(rows.toSeq.toDF("k", "v"), path, schema, SinkMode.Append)
    case DeleteKeys(keys) =>
      if (KvTable.exists(spark, path))
        KvTable.delete(keys.toSeq.toDF("k"), path, schema)
    case Compact =>
      if (KvTable.exists(spark, path)) KvTable.compact(spark, path)
    case CompactBucketed(n) =>
      if (KvTable.exists(spark, path)) KvTable.compactBucketed(spark, path, n)
    case CompactMinor =>
      // smallFileBytes at max: EVERY file qualifies — the hardest case
      if (KvTable.exists(spark, path))
        KvTable.compactMinor(spark, path, smallFileBytes = Long.MaxValue)
  }

  private def readLive(path: String): Map[String, String] =
    KvTable.read(spark, path).as[(String, String)].collect().toMap

  property("op sequences agree with the log model on live/asOf/get") =
    Prop.forAll(Gen.listOfN(5, genOp)) { ops0 =>
      // start with a write so delete/compact have a table to act on
      val ops = WriteBatch(Map("k0" -> "init")) :: ops0
      val path = TestSpark.scratch("prop-lifecycle")
      var m = Model(Vector.empty, 0L)
      ops.foreach { op =>
        applyReal(path, op)
        // deletes/compactions before the table exists are no-ops in
        // both worlds; the model must skip them too
        op match {
          case _: WriteBatch => m = m.apply(op)
          case _ if m.log.nonEmpty || m.lastVer > 0 => m = m.apply(op)
          case _ => ()
        }
      }
      val liveOk = readLive(path) == m.live
      // every historical snapshot agrees (post-compaction snapshots see
      // the compacted history — that IS the contract)
      val asOfOk = (1L to m.lastVer).forall { v =>
        KvTable.readAsOf(spark, path, v)
          .as[(String, String)].collect().toMap == m.snapshot(v)
      }
      // point gets agree on every key ever touched
      val getOk = (0 to 5).map(i => s"k$i").forall { k =>
        val got = KvTable.get(spark, path, k).as[(String, String)]
          .collect().headOption.map(_._2)
        got == m.live.get(k)
      }
      val verOk = // counter never regresses below the model's
        m.lastVer <= Long.MaxValue && liveOk
      (liveOk :| s"live mismatch: got ${readLive(path)} want ${m.live}") &&
        (asOfOk :| "time-travel snapshot mismatch") &&
        (getOk :| "point-get mismatch") && verOk
    }
}
