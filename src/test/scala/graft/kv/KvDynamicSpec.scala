package graft.kv

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

/** Dynamic column-family (schemaless wide-row) semantics: CELL-level
  * last-write-wins, HBase merge behavior — unlike the fixed-schema
  * KvTable, two Puts touching different qualifiers of one row MERGE.
  */
class KvDynamicSpec extends SparkSpec {
  import spark.implicits._

  test("cell-level LWW merges puts across writes; row delete hides all; " +
    "cell delete hides one") {
    val path = TestSpark.scratch("kvdyn")
    // write 1: row a gets f:{q1,v1}, f:{q2,v2}; row b gets f:{q1,b1}
    KvDynamic.writeCells(Seq(
      ("a", "f", "q1", "v1"), ("a", "f", "q2", "v2"), ("b", "f", "q1", "b1"))
      .toDF("k", "family", "qualifier", "value"),
      path, "k", SinkMode.Replace)
    // write 2: row a updates q1 and ADDS g:q3 — q2 must survive (merge!)
    KvDynamic.writeCells(Seq(
      ("a", "f", "q1", "v1x"), ("a", "g", "q3", "v3"))
      .toDF("k", "family", "qualifier", "value"),
      path, "k")
    val cells = KvDynamic.readCells(spark, path)
      .select("__key", "family", "qualifier", "value")
      .as[(String, String, String, String)].collect().sorted
    assert(cells === Array(
      ("a", "f", "q1", "v1x"), ("a", "f", "q2", "v2"),
      ("a", "g", "q3", "v3"), ("b", "f", "q1", "b1")))

    // wide view: one map per family, qualifier-sorted
    val wide = KvDynamic.read(spark, path).orderBy("k")
      .as[(String, Map[String, String], Map[String, String])].collect()
    assert(wide === Array(
      ("a", Map("q1" -> "v1x", "q2" -> "v2"), Map("q3" -> "v3")),
      ("b", Map("q1" -> "b1"), Map.empty[String, String])))

    // cell delete: a/f:q2 vanishes, everything else intact
    KvDynamic.deleteCells(Seq(("a", "f", "q2")).toDF("k", "family", "qualifier"),
      path, "k")
    assert(KvDynamic.readCells(spark, path)
      .filter($"__key" === "a" && $"qualifier" === "q2").count() === 0)
    assert(KvDynamic.readCells(spark, path).count() === 3)

    // row delete: b disappears entirely
    KvDynamic.deleteRows(Seq("b").toDF("k"), path, "k")
    assert(KvDynamic.readCells(spark, path).filter($"__key" === "b").count() === 0)

    // post-delete put resurrects the row (newer than the tombstone)
    KvDynamic.writeCells(Seq(("b", "f", "q9", "back"))
      .toDF("k", "family", "qualifier", "value"), path, "k")
    assert(KvDynamic.readCells(spark, path).filter($"__key" === "b")
      .select("value").as[String].collect() === Array("back"))
  }

  test("regressed tombstone version cannot regress the meta counter") {
    val path = TestSpark.scratch("kvdyn-ver-regress")
    KvDynamic.writeCells(Seq(("k1", "f", "q", "v1"))
      .toDF("k", "family", "qualifier", "value"), path, "k",
      SinkMode.Replace) // version 1
    // explicitly old tombstone: no-op for LWW, must not reset the counter
    KvDynamic.deleteRows(Seq("k1").toDF("k"), path, "k", version = Some(0L))
    KvDynamic.writeCells(Seq(("k1", "f", "q", "v2"))
      .toDF("k", "family", "qualifier", "value"), path, "k") // version 2
    val rows = KvDynamic.readCells(spark, path)
      .select("value", "version").as[(String, Long)].collect()
    assert(rows === Array(("v2", 2L)))
  }

  test("wide read of a table with no recorded families is a key-only view") {
    val path = TestSpark.scratch("kvdyn-nofam")
    KvDynamic.writeCells(Seq.empty[(String, String, String, String)]
      .toDF("k", "family", "qualifier", "value"), path, "k",
      SinkMode.Replace)
    val wide = KvDynamic.read(spark, path)
    assert(wide.columns === Array("k"))
    assert(wide.count() === 0)
  }

  test("event-time versions: older cell write cannot clobber newer") {
    val path = TestSpark.scratch("kvdyn-ver")
    def put(v: String, ts: Long): Unit =
      KvDynamic.writeCells(Seq(("k1", "f", "q", v, ts))
        .toDF("k", "family", "qualifier", "value", "ts"),
        path, "k", versionFrom = Some(col("ts")))
    KvDynamic.drop(spark, path)
    put("newer", 200L)
    put("older", 100L) // arrives later, but event-time older -> loses
    assert(KvDynamic.readCells(spark, path).select("value")
      .as[String].collect() === Array("newer"))
  }
}
