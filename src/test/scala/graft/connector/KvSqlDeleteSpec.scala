package graft.connector

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable}

/** SQL DELETE (SupportsDelete → tombstone append) and the native
  * streaming sink (`writeStream.format("kvtable")` → one append commit
  * per epoch): the reference's Delete-mutation dispatch
  * (`TableOutputFormatWrap.java:79-84`) through SQL, and its
  * flow-at-a-time APPEND (`MultiFamilyCascadeHBaseTest.java:94-104`)
  * generalized to micro-batch epochs.
  */
class KvSqlDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = TestSpark.scratch("kvdelete-wh")

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.cat_del", "graft.connector.KvCatalog")
    spark.conf.set("spark.sql.catalog.cat_del.warehouse", warehouse)
  }

  test("SQL DELETE by key appends tombstones; non-key predicates fail loudly") {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat_del.ns")
    spark.sql(
      """CREATE TABLE cat_del.ns.d (k STRING, v STRING)
        |USING kvtable TBLPROPERTIES ('kv.key'='k')""".stripMargin)
    spark.sql("INSERT INTO cat_del.ns.d (k, v) VALUES " +
      "('a','1'), ('b','2'), ('c','3'), ('d','4'), ('e','5')")
    val path = s"$warehouse/ns/d"
    val schema = KvTable.readSchema(spark, path)
    def live() = KvTable.lwwView(spark.table("cat_del.ns.d"), schema)

    // point delete
    spark.sql("DELETE FROM cat_del.ns.d WHERE k = 'a'")
    assert(live().orderBy("k").as[(String, String)].collect()
      .map(_._1) === Array("b", "c", "d", "e"))

    // IN-list and OR-of-equalities both address key sets
    spark.sql("DELETE FROM cat_del.ns.d WHERE k IN ('b', 'c')")
    spark.sql("DELETE FROM cat_del.ns.d WHERE k = 'd' OR k = 'zzz'")
    assert(live().as[(String, String)].collect() === Array(("e", "5")))

    // deletes are tombstone APPENDS — the log keeps full history
    val raw = spark.table("cat_del.ns.d")
    assert(raw.count() === 5 + 5) // 5 puts + 5 tombstones (a,b,c,d,zzz)
    assert(raw.filter(col(KvTable.TombstoneCol)).count() === 5)

    // a non-key predicate must fail analysis, not silently rewrite
    val e = intercept[Exception] {
      spark.sql("DELETE FROM cat_del.ns.d WHERE v = '5'")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))

    // a fresh put resurrects a deleted key (newer version wins)
    spark.sql("INSERT INTO cat_del.ns.d (k, v) VALUES ('a', 'back')")
    assert(live().orderBy("k").as[(String, String)].collect() ===
      Array(("a", "back"), ("e", "5")))
  }

  test("unconditional SQL DELETE truncates; table stays writable") {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat_del.ns")
    spark.sql(
      """CREATE TABLE cat_del.ns.t2 (k STRING, v STRING)
        |USING kvtable TBLPROPERTIES ('kv.key'='k')""".stripMargin)
    spark.sql("INSERT INTO cat_del.ns.t2 (k, v) VALUES ('a','1'), ('b','2')")
    spark.sql("DELETE FROM cat_del.ns.t2")
    assert(spark.table("cat_del.ns.t2").count() === 0)
    spark.sql("INSERT INTO cat_del.ns.t2 (k, v) VALUES ('c','3')")
    val schema = KvTable.readSchema(spark, s"$warehouse/ns/t2")
    assert(KvTable.lwwView(spark.table("cat_del.ns.t2"), schema)
      .as[(String, String)].collect() === Array(("c", "3")))
  }

  test("native streaming sink: one append commit per epoch, LWW across epochs") {
    val path = TestSpark.scratch("kv-stream-sink")
    val schema = KvSchema.of("k", "v" -> ("f", "v"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("k", "v")
      .writeStream
      .format("kvtable")
      .option("kvschema", schema.toJson)
      .option("checkpointLocation", s"$path-ckpt")
      .outputMode("append")
      .start(path)
    try {
      input.addData(("1", "a"), ("2", "b"))
      q.processAllAvailable()
      assert(KvTable.read(spark, path).count() === 2)
      input.addData(("2", "B2"), ("3", "c"))
      q.processAllAvailable()
      val rows = KvTable.read(spark, path).orderBy("k")
        .as[(String, String)].collect()
      assert(rows === Array(("1", "a"), ("2", "B2"), ("3", "c")))
      // the log keeps both epochs, under DISTINCT monotone versions
      val raw = KvTable.readRaw(spark, path)
      assert(raw.count() === 4)
      assert(raw.select(countDistinct(col(KvTable.VersionCol)))
        .as[Long].head() === 2L)
      // epoch-2 rows carry the larger version (LWW orders epochs)
      val v2 = raw.filter(col("k") === "3")
        .select(col(KvTable.VersionCol)).as[Long].head()
      val v1 = raw.filter(col("k") === "1")
        .select(col(KvTable.VersionCol)).as[Long].head()
      assert(v2 > v1)
    } finally q.stop()
  }
}
