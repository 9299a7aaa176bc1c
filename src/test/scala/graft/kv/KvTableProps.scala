package graft.kv

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark

/** ScalaCheck properties for the last-write-wins semantics (SURVEY.md §5:
  * idempotent upsert, newest-version-wins, tombstone removal) — checked
  * against a trivial in-memory reference model.
  */
object KvTableProps extends Properties("KvTable.LWW") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each sample spins real Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = KvSchema.of("k", "v" -> ("f", "v"))

  private val genRows: Gen[List[(String, String, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0, 7).map(i => s"k$i")
      v <- Gen.alphaStr.map(_.take(6))
      ver <- Gen.choose(0L, 5L)
    } yield (k, v, ver))

  /** Reference model: per key, the row with max (version, arrival idx). */
  private def model(rows: List[(String, String, Long)]): Map[String, String] =
    rows.zipWithIndex
      .groupBy(_._1._1)
      .view.mapValues(_.maxBy { case ((_, _, ver), idx) => (ver, idx) }._1._2)
      .toMap

  property("read == newest-version-wins model, any write split") =
    Prop.forAll(genRows, Gen.choose(0, 30)) { (rows, splitAt) =>
      rows.nonEmpty ==> {
        val path = TestSpark.scratch("prop-lww")
        val (a, b) = rows.splitAt(splitAt min rows.length)
        // arrival order within a batch tiebreaks equal versions, like
        // HBase seqids — preserve it via coalesce(1)
        def write(part: List[(String, String, Long)], mode: SinkMode): Unit =
          if (part.nonEmpty)
            KvTable.write(part.toDF("k", "v", "ver").coalesce(1), path, schema,
              mode, Some(col("ver") * 2 + (if (mode == SinkMode.Replace) 0 else 1)))
        // same-version rows in batch 2 must beat batch 1 (later seq):
        // encode batch into version low bit to keep the model simple.
        write(a, SinkMode.Replace)
        if (a.isEmpty) write(b, SinkMode.Replace) else write(b, SinkMode.Append)
        val got = KvTable.read(spark, path).as[(String, String)].collect().toMap
        val want = model(a ++ b) // batch-2 wins ties by construction
        Prop(got == want) :| s"got=$got want=$want"
      }
    }

  property("upsert is idempotent: re-appending identical data changes nothing") =
    Prop.forAll(genRows) { rows =>
      rows.nonEmpty ==> {
        val path = TestSpark.scratch("prop-idem")
        val df = rows.toDF("k", "v", "ver").coalesce(1)
        KvTable.write(df, path, schema, SinkMode.Replace, Some(col("ver")))
        val first = KvTable.read(spark, path).as[(String, String)].collect().toSet
        KvTable.write(df, path, schema, SinkMode.Append, Some(col("ver")))
        val second = KvTable.read(spark, path).as[(String, String)].collect().toSet
        Prop(first == second) :| s"first=$first second=$second"
      }
    }

  property("tombstoned keys vanish; others unaffected") =
    Prop.forAll(genRows, Gen.someOf(0 to 7)) { (rows, dead) =>
      rows.nonEmpty ==> {
        val path = TestSpark.scratch("prop-tomb")
        KvTable.write(rows.toDF("k", "v", "ver").coalesce(1), path, schema,
          SinkMode.Replace, Some(col("ver")))
        val deadKeys = dead.map(i => s"k$i").toSet
        // tombstone version must dominate the data's version domain
        if (deadKeys.nonEmpty)
          KvTable.delete(deadKeys.toSeq.toDF("k"), path, schema,
            version = Some(100L))
        val got = KvTable.read(spark, path).select("k").as[String].collect().toSet
        val want = model(rows).keySet -- deadKeys
        Prop(got == want) :| s"got=$got want=$want"
      }
    }
}
