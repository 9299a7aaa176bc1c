package graft.connector

import java.util.concurrent.atomic.AtomicInteger

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark
import graft.kv.KvTable

/** Differential fuzz for the SQL row-level path: RANDOM sequences of
  * INSERT INTO / UPDATE / DELETE / MERGE INTO / CALL system.compact
  * against a driver-side set-algebra model (the KvMutationProps
  * pattern extended to the SQL entry points). The example-based
  * KvRowLevelSpec pins each statement shape once; this pins their
  * INTERPLAY — updates reading values produced by earlier merges,
  * deletes landing between compactions, upsert-inserts superseding
  * merged rows — where a stale-version read or a tombstone-masking bug
  * would first show.
  *
  * Every generated statement is valid by construction (distinct MERGE
  * source keys, non-empty VALUES lists are enforced inside the
  * property — ScalaCheck SHRINKING ignores generator invariants, so
  * empty collections are re-normalized to no-ops rather than fed to
  * the SQL parser).
  */
object KvRowLevelProps extends Properties("KvRowLevel.sql") {

  /** Every run draws (or takes from GRAFT_FUZZ_SEED) one seed, prints
    * it, pins ScalaCheck's generator stream to it, and stamps it into
    * the failure label — so a one-off failure in a long soak is
    * REPLAYABLE (`GRAFT_FUZZ_SEED=<n> sbt "testOnly ...KvRowLevelProps"`)
    * instead of a ghost. (A round-9 full-suite run logged exactly one
    * unreproduced error here; this is the capture plumbing.) */
  private val runSeed: Long = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
    .getOrElse(new java.security.SecureRandom().nextLong())
  println(s"KvRowLevelProps seed=$runSeed (replay: GRAFT_FUZZ_SEED=$runSeed)")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withInitialSeed(runSeed)

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.cat_fz", "graft.connector.KvCatalog")
    s.conf.set("spark.sql.catalog.cat_fz.warehouse",
      TestSpark.scratch("kvrowlevel-fuzz-wh"))
    s
  }
  import spark.implicits._

  private val nTable = new AtomicInteger(0)

  /** Deterministic predicate over (v, n) with one SQL and one model
    * spelling — the differential core. */
  private sealed trait Pred {
    def sql: String
    def eval(v: String, n: Long): Boolean
  }
  private case class NGe(x: Long) extends Pred {
    def sql = s"n >= $x"
    def eval(v: String, n: Long): Boolean = n >= x
  }
  private case object NEven extends Pred {
    def sql = "n % 2 = 0"
    def eval(v: String, n: Long): Boolean = n % 2 == 0
  }
  private case class VIs(s: String) extends Pred {
    def sql = s"v = '$s'"
    def eval(v: String, n: Long): Boolean = v == s
  }

  private sealed trait Op
  private case class Ins(rows: Map[String, (String, Long)]) extends Op
  private case class Upd(pred: Pred, dn: Long) extends Op
  private case class Del(pred: Pred) extends Op
  /** MERGE: matched AND s.n >= delT -> DELETE; matched -> UPDATE SET
    * v = s.v, n = s.n + t.n; not matched -> INSERT. */
  private case class Merge(src: Map[String, (String, Long)], delT: Long)
      extends Op
  private case object Compact extends Op

  private val genKey: Gen[String] = Gen.choose(0, 4).map(i => s"k$i")
  private val genVal: Gen[String] = Gen.oneOf("p", "q", "r")
  private val genN: Gen[Long] = Gen.choose(0L, 99L)
  private val genRows: Gen[Map[String, (String, Long)]] = for {
    m <- Gen.choose(1, 3)
    ks <- Gen.listOfN(m, genKey)
    vs <- Gen.listOfN(m, genVal)
    ns <- Gen.listOfN(m, genN)
  } yield ks.lazyZip(vs.zip(ns)).toMap
  private val genPred: Gen[Pred] = Gen.oneOf(
    Gen.choose(0L, 120L).map(NGe.apply),
    Gen.const(NEven),
    genVal.map(VIs.apply))
  private val genOp: Gen[Op] = Gen.frequency(
    3 -> genRows.map(Ins.apply),
    3 -> (for { p <- genPred; d <- Gen.choose(1L, 7L) } yield Upd(p, d)),
    2 -> genPred.map(Del.apply),
    3 -> (for { r <- genRows; t <- Gen.choose(0L, 120L) } yield Merge(r, t)),
    1 -> Gen.const(Compact))

  private def applyModel(m: Map[String, (String, Long)], op: Op)
      : Map[String, (String, Long)] = op match {
    case Ins(rows) => m ++ rows // kvtable INSERT is an LWW upsert
    case Upd(p, d) => m.map {
      case (k, (v, n)) if p.eval(v, n) => k -> (v + "!", n + d)
      case kv => kv
    }
    case Del(p) => m.filterNot { case (_, (v, n)) => p.eval(v, n) }
    case Merge(src, delT) =>
      val afterMatched = m.flatMap { case (k, (v, n)) =>
        src.get(k) match {
          case Some((_, sn)) if sn >= delT => None
          case Some((sv, sn)) => Some(k -> (sv, sn + n))
          case None => Some(k -> (v, n))
        }
      }
      afterMatched ++ (src -- m.keySet)
    case Compact => m
  }

  private def applySql(t: String, op: Op): Unit = op match {
    case Ins(rows) if rows.nonEmpty =>
      val values = rows.map { case (k, (v, n)) => s"('$k','$v',$n)" }
        .mkString(", ")
      spark.sql(s"INSERT INTO cat_fz.$t (k, v, n) VALUES $values")
    case Ins(_) => ()
    case Upd(p, d) =>
      spark.sql(s"UPDATE cat_fz.$t SET v = concat(v, '!'), n = n + $d " +
        s"WHERE ${p.sql}")
    case Del(p) =>
      spark.sql(s"DELETE FROM cat_fz.$t WHERE ${p.sql}")
    case Merge(src, delT) if src.nonEmpty =>
      val view = s"src_$t"
      src.toSeq.map { case (k, (v, n)) => (k, v, n) }
        .toDF("k", "v", "n").createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO cat_fz.$t t USING $view s ON t.k = s.k
           |WHEN MATCHED AND s.n >= $delT THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n + t.n
           |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)
           |""".stripMargin)
    case Merge(_, _) => ()
    case Compact =>
      spark.sql(s"CALL cat_fz.system.compact('$t', 2)")
  }

  property("random INSERT/UPDATE/DELETE/MERGE/compact sequences agree " +
    "with the set-algebra model") =
    Prop.forAll(Gen.listOfN(5, genOp)) { ops0 =>
      // seed rows + the bucket compaction row-level ops require
      val t = s"fz${nTable.incrementAndGet()}"
      spark.sql(s"DROP TABLE IF EXISTS cat_fz.$t")
      spark.sql(s"CREATE TABLE cat_fz.$t (k STRING, v STRING, n BIGINT) " +
        "USING kvtable TBLPROPERTIES ('kv.key'='k')")
      val seed = Ins(Map("k0" -> ("p", 10L), "k1" -> ("q", 21L)))
      applySql(t, seed)
      spark.sql(s"CALL cat_fz.system.compact('$t', 2)")
      var model = applyModel(Map.empty, seed)
      ops0.foreach { op => applySql(t, op); model = applyModel(model, op) }
      val path = s"${spark.conf.get("spark.sql.catalog.cat_fz.warehouse")}/$t"
      val got = KvTable.lwwView(spark.table(s"cat_fz.$t"),
          KvTable.readSchema(spark, path))
        .as[(String, String, Long)].collect()
        .map { case (k, v, n) => k -> (v, n) }.toMap
      spark.sql(s"DROP TABLE cat_fz.$t")
      (got == model) :| s"seed=$runSeed engine=$got model=$model ops=$ops0"
    }
}
