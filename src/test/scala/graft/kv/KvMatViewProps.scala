package graft.kv

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark

/** Stateful property for incremental view maintenance: under a RANDOM
  * interleaving of base upserts (including group-moving updates), key
  * deletes, and refresh calls, the materialized view must equal the
  * per-group aggregate recomputed from scratch over the base's live LWW
  * view after EVERY refresh — including refreshes that cover several
  * accumulated mutation batches in one delta window, the case the
  * single-op specs can't pin.
  */
object KvMatViewProps extends Properties("KvMatView.incremental") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each sample runs many real Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = KvSchema.of("k", "grp" -> ("f", "g"),
    "amt" -> ("f", "a"))

  private sealed trait Op
  private case class WriteBatch(rows: Map[String, (String, Long)]) extends Op
  private case class DeleteKeys(keys: Set[String]) extends Op
  private case object Refresh extends Op

  private val genKey: Gen[String] = Gen.choose(0, 7).map(i => s"k$i")
  private val genGrp: Gen[String] = Gen.choose(0, 3).map(i => s"g$i")

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> (for {
      n <- Gen.choose(1, 4)
      ks <- Gen.listOfN(n, genKey)
      gs <- Gen.listOfN(n, genGrp)
      vs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield WriteBatch(ks.lazyZip(gs).lazyZip(vs)
      .map((k, g, v) => k -> (g, v)).toMap)),
    2 -> Gen.nonEmptyListOf(genKey).map(ks => DeleteKeys(ks.toSet)),
    3 -> Gen.const(Refresh)
  )

  private def recomputed(base: String): Map[String, (Long, Long)] =
    KvTable.read(spark, base).as[(String, String, Long)].collect()
      .groupBy(_._2)
      .map { case (g, rows) => g -> (rows.length.toLong, rows.map(_._3).sum) }

  private def viewRows(view: String): Map[String, (Long, Long)] =
    KvMatView.read(spark, view).as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  property("view == from-scratch recompute after every refresh") =
    Prop.forAll(Gen.listOfN(7, genOp)) { ops =>
      val base = TestSpark.scratch("prop-mv-base")
      val view = TestSpark.scratch("prop-mv-view")
      KvTable.write(Seq(("k0", "g0", 1L)).toDF("k", "grp", "amt"),
        base, schema, SinkMode.Replace)
      KvMatView.build(spark, base, view, "grp", Seq("amt"))
      var ok = Prop.Result(status = Prop.True)
      ops.foreach {
        case WriteBatch(rows) =>
          KvTable.write(rows.toSeq.map { case (k, (g, v)) => (k, g, v) }
            .toDF("k", "grp", "amt"), base, schema, SinkMode.Append)
        case DeleteKeys(keys) =>
          KvTable.delete(keys.toSeq.toDF("k"), base, schema)
        case Refresh =>
          KvMatView.refresh(spark, base, view)
          if (viewRows(view) != recomputed(base))
            ok = Prop.Result(status = Prop.False)
      }
      // a final refresh must always converge, whatever tail of
      // unrefreshed mutations the sequence left behind
      KvMatView.refresh(spark, base, view)
      val fin = viewRows(view) == recomputed(base)
      (ok.success :| "mid-sequence refresh diverged from recompute") &&
        (fin :| s"final view ${viewRows(view)} != ${recomputed(base)}")
    }
}
