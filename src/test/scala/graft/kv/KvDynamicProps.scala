package graft.kv

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark

/** ScalaCheck properties for the dynamic column-family mode's CELL-level
  * last-write-wins against an in-memory reference model: puts touching
  * different qualifiers of a row MERGE (HBase semantics), newest version
  * wins per cell, row tombstones hide all strictly-older cells.
  */
object KvDynamicProps extends Properties("KvDynamic.cellLWW") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each sample spins real Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (key, family, qualifier, value, version) cell mutations. */
  private val genCells: Gen[List[(String, String, String, String, Long)]] =
    Gen.listOfN(25, for {
      k <- Gen.choose(0, 4).map(i => s"k$i")
      f <- Gen.oneOf("fam1", "fam2")
      q <- Gen.choose(0, 2).map(i => s"q$i")
      v <- Gen.alphaStr.map(s => "v" + s.take(4))
      ver <- Gen.choose(1L, 5L)
    } yield (k, f, q, v, ver))

  /** Reference model: per (key, family, qualifier), the value with max
    * (version, arrival index); rows deleted at `delVer` keep only cells
    * with version STRICTLY newer. */
  private def model(cells: List[(String, String, String, String, Long)],
                    deleted: Map[String, Long])
      : Map[(String, String, String), String] =
    cells.zipWithIndex
      .groupBy { case ((k, f, q, _, _), _) => (k, f, q) }
      .view.mapValues(_.maxBy { case ((_, _, _, _, ver), idx) => (ver, idx) })
      .toMap
      .collect {
        case ((k, f, q), ((_, _, _, v, ver), _))
          if !deleted.get(k).exists(ver <= _) => (k, f, q) -> v
      }

  property("readCells == cell-level newest-wins model, any batch split") =
    Prop.forAll(genCells, Gen.choose(0, 25)) { (cells, splitAt) =>
      cells.nonEmpty ==> {
        val path = TestSpark.scratch("prop-dyn")
        val (a, b) = cells.splitAt(splitAt min cells.length)
        // mirror KvTableProps: version low bit encodes the batch so
        // batch-2 beats batch-1 on equal versions, keeping arrival-order
        // ties out of the distributed path (coalesce(1) preserves order
        // within a batch).
        def write(part: List[(String, String, String, String, Long)],
                  mode: SinkMode, bit: Long): Unit =
          if (part.nonEmpty)
            KvDynamic.writeCells(
              part.toDF("k", "family", "qualifier", "value", "ver").coalesce(1),
              path, "k", mode, Some(col("ver") * 2 + bit))
        KvDynamic.drop(spark, path)
        write(a, SinkMode.Replace, 0)
        if (a.isEmpty) write(b, SinkMode.Replace, 1) else write(b, SinkMode.Append, 1)
        val adj = a.map(c => c.copy(_5 = c._5 * 2)) ++
          b.map(c => c.copy(_5 = c._5 * 2 + 1))
        val got = KvDynamic.readCells(spark, path)
          .select("__key", "family", "qualifier", "value")
          .as[(String, String, String, String)].collect()
          .map { case (k, f, q, v) => (k, f, q) -> v }.toMap
        val want = model(adj, Map.empty)
        Prop(got == want) :| s"got=$got want=$want"
      }
    }

  property("row tombstone hides strictly-older cells; newer puts survive") =
    Prop.forAll(genCells, Gen.choose(0, 4).map(i => s"k$i")) { (cells, victim) =>
      cells.nonEmpty ==> {
        val path = TestSpark.scratch("prop-dyntomb")
        KvDynamic.drop(spark, path)
        KvDynamic.writeCells(
          cells.toDF("k", "family", "qualifier", "value", "ver").coalesce(1),
          path, "k", SinkMode.Replace, Some(col("ver") * 2))
        val delVer = 7L // above some cell versions (2..10), below others
        KvDynamic.deleteRows(Seq(victim).toDF("k"), path, "k", Some(delVer))
        val adj = cells.map(c => c.copy(_5 = c._5 * 2))
        val want = model(adj, Map(victim -> delVer))
        val got = KvDynamic.readCells(spark, path)
          .select("__key", "family", "qualifier", "value")
          .as[(String, String, String, String)].collect()
          .map { case (k, f, q, v) => (k, f, q) -> v }.toMap
        Prop(got == want) :| s"victim=$victim got=$got want=$want"
      }
    }
}
