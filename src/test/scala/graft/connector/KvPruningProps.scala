package graft.connector

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark
import graft.kv.{KvSchema, KvTable, SinkMode}

/** Pruning-soundness property: whatever combination of per-file blooms,
  * row-group min/max stats, and bucket routing the planner uses, a
  * point read through `format("kvtable")` must return exactly what the
  * in-memory LWW model says — for keys that exist, keys that never
  * existed (bloom true-negative territory), and deleted keys (the
  * tombstone's file must never be skipped). Random multi-batch V2
  * writes + deletes, optional bucket compaction.
  */
object KvPruningProps extends Properties("KvV2.pruning") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each sample runs many Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = KvSchema.of("k", "v" -> ("f", "v"))

  private case class Batch(rows: Map[String, String], deletes: Set[String])

  private val genKey: Gen[String] = Gen.choose(0, 19).map(i => f"k$i%03d")
  private val genBatch: Gen[Batch] = for {
    n <- Gen.choose(1, 6)
    ks <- Gen.listOfN(n, genKey)
    vs <- Gen.listOfN(n, Gen.alphaStr.map(_.take(4)))
    nd <- Gen.choose(0, 2)
    ds <- Gen.listOfN(nd, genKey)
  } yield Batch(ks.zip(vs).toMap, ds.toSet)

  property("point reads equal the model under bloom/stats/bucket pruning") =
    Prop.forAll(Gen.listOfN(4, genBatch), Gen.oneOf(0, 0, 3)) {
      (batches, buckets) =>
        batches.nonEmpty ==> {
          val path = TestSpark.scratch("prop-prune")
          var model = Map.empty[String, String]
          batches.zipWithIndex.foreach { case (b, i) =>
            KvTable.writeV2(b.rows.toSeq.toDF("k", "v"), path, schema,
              if (i == 0) SinkMode.Replace else SinkMode.Append)
            model ++= b.rows
            if (b.deletes.nonEmpty) {
              KvTable.deleteV2(b.deletes.toSeq.toDF("k"), path, schema)
              model --= b.deletes
            }
          }
          if (buckets > 0) {
            KvTable.compactBucketed(spark, path, buckets)
            // post-compaction appends exercise bloom'd files atop the
            // bucketed layout
            KvTable.writeV2(Seq(("k001", "post")).toDF("k", "v"), path, schema)
            model += ("k001" -> "post")
          }
          val probes = (0 to 19).map(i => f"k$i%03d") ++
            Seq("absent", "zzz") // never written: pure bloom negatives
          probes.map { k =>
            val got = KvTable.readV2(spark, path)
              .filter(col("k") === k).select("v")
              .as[String].collect().toSeq
            val want = model.get(k).toSeq
            (got == want) :| s"key $k: got $got want $want (buckets=$buckets)"
          }.reduce(_ && _)
        }
    }
}
