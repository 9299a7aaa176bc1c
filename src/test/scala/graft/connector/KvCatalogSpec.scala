package graft.connector

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable}

/** SQL catalog lifecycle (the reference's HBaseTap create/exists/delete
  * surface, `HBaseTap.java:69-101`, through Spark's TableCatalog):
  * CREATE TABLE ... USING kvtable, INSERT with synthesized engine
  * columns, catalog-identifier reads, RENAME, DROP.
  */
class KvCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = TestSpark.scratch("kvcatalog-wh")

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.cat_test", "graft.connector.KvCatalog")
    spark.conf.set("spark.sql.catalog.cat_test.warehouse", warehouse)
  }

  test("CREATE / EXISTS / INSERT-upsert / RENAME / DROP round trip via SQL") {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat_test.ns")
    spark.sql(
      """CREATE TABLE cat_test.ns.t (k STRING, v STRING, n BIGINT)
        |USING kvtable TBLPROPERTIES (
        |  'kv.key'='k', 'kv.map.v'='left:val')""".stripMargin)
    assert(spark.catalog.tableExists("cat_test.ns.t"))
    // CREATE on an existing table fails (HBaseTap Keep semantics)
    intercept[Exception] {
      spark.sql("CREATE TABLE cat_test.ns.t (k STRING) USING kvtable")
    }

    // empty table is immediately readable (schema from the manifest base)
    assert(spark.table("cat_test.ns.t").count() === 0)

    // INSERT synthesizes engine columns; second INSERT is a newer batch
    spark.sql(
      "INSERT INTO cat_test.ns.t (k, v, n) VALUES ('a', 'x', 1), ('b', 'y', 2)")
    spark.sql(
      "INSERT INTO cat_test.ns.t (k, v, n) VALUES ('a', 'x2', 10)")
    val raw = spark.table("cat_test.ns.t")
    assert(raw.columns.contains("__version")) // raw log exposed
    assert(raw.count() === 3)                 // all versions present
    // versions are per-statement batches, never null
    assert(raw.filter(col("__version").isNull).count() === 0)
    assert(raw.select(max("__version")).as[Long].head() === 2L)

    // the LWW view over the catalog read collapses to the newest batch
    val schema = KvTable.readSchema(spark, s"$warehouse/ns/t")
    assert(schema === KvSchema.of("k",
      "v" -> ("left", "val"), "n" -> ("f", "n")))
    val lww = KvTable.lwwView(raw, schema).orderBy("k")
      .as[(String, String, Long)].collect()
    assert(lww === Array(("a", "x2", 10L), ("b", "y", 2L)))

    // the path-based API sees the same table (catalog = addressing only)
    assert(KvTable.read(spark, s"$warehouse/ns/t").count() === 2)

    assert(spark.sql("SHOW TABLES IN cat_test.ns").count() === 1)

    // the RENAME target is catalog-relative (same catalog, full namespace)
    spark.sql("ALTER TABLE cat_test.ns.t RENAME TO ns.t2")
    assert(!spark.catalog.tableExists("cat_test.ns.t"))
    assert(spark.table("cat_test.ns.t2").count() === 3)

    spark.sql("DROP TABLE cat_test.ns.t2")
    assert(!spark.catalog.tableExists("cat_test.ns.t2"))
  }

  test("CALL system.compact rewrites the log; bucketed variant prunes gets") {
    ensureCatalog()
    spark.sql(
      "CREATE TABLE cat_test.cmp (k BIGINT, n BIGINT) USING kvtable")
    spark.sql("INSERT INTO cat_test.cmp (k, n) " +
      "SELECT id, id * 10 FROM range(0, 100)")
    spark.sql("INSERT INTO cat_test.cmp (k, n) " +
      "SELECT id, id * 100 FROM range(0, 50)") // newer batch upserts half
    val path = s"$warehouse/cmp"
    assert(spark.table("cat_test.cmp").count() === 150) // raw log, 2 batches

    // flat major compaction: one current version per key, LWW unchanged
    spark.sql("CALL cat_test.system.compact(table => 'cmp')")
    assert(spark.table("cat_test.cmp").count() === 100)
    val lww = KvTable.read(spark, path)
    assert(lww.count() === 100)
    assert(lww.filter(col("k") === 7).select("n").as[Long].head() === 700L)

    // bucketed compaction through the positional-args form
    spark.sql("CALL cat_test.system.compact('cmp', 4)")
    assert(KvTable.numBuckets(spark, path) === 4)
    assert(KvTable.get(spark, path, 7).select("n").as[Long].head() === 700L)

    // unknown procedure is a clear error
    intercept[Exception] { spark.sql("CALL cat_test.system.nope('x')") }
    spark.sql("DROP TABLE cat_test.cmp")
  }

  test("CALL system.compact_minor merges small files but keeps the raw " +
    "log (lossless maintenance through SQL)") {
    ensureCatalog()
    spark.sql("CREATE TABLE cat_test.mnr (k BIGINT, n BIGINT) USING kvtable")
    (1 to 3).foreach { i =>
      spark.sql(s"INSERT INTO cat_test.mnr (k, n) " +
        s"SELECT id, id * $i FROM range(0, 20)")
    }
    val path = s"$warehouse/mnr"
    assert(spark.table("cat_test.mnr").count() === 60) // raw log intact
    spark.sql("CALL cat_test.system.compact_minor(table => 'mnr')")
    // lossless: every log row survives, fewer files hold them
    assert(spark.table("cat_test.mnr").count() === 60)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val files = f.listStatus(new org.apache.hadoop.fs.Path(s"$path/data"))
      .filter(e => e.isFile && e.getPath.getName.endsWith(".parquet"))
    assert(files.length === 1, s"expected 1 merged file, got ${files.length}")
    assert(KvTable.read(spark, path).filter(col("k") === 7)
      .select("n").as[Long].head() === 21L)
    spark.sql("DROP TABLE cat_test.mnr")
  }

  test("t$files metadata table reports layout health from the manifest") {
    ensureCatalog()
    spark.sql("CREATE TABLE cat_test.mf (k BIGINT, n BIGINT) USING kvtable")
    spark.sql("INSERT INTO cat_test.mf (k, n) SELECT id, id FROM range(0, 30)")
    spark.sql("INSERT INTO cat_test.mf (k, n) SELECT id, id FROM range(30, 40)")
    val before = spark.sql("SELECT * FROM cat_test.`mf$files`").collect()
    assert(before.length >= 2) // at least one file per INSERT
    assert(before.map(_.getAs[Long]("rows")).sum === 40L)
    assert(before.forall(_.getAs[Long]("bytes") > 0))
    // rowkey min/max merged from the per-group stats (long-typed key)
    val mins = before.map(_.getAs[String]("key_min")).filter(_ != null)
    assert(mins.map(_.toLong).min === 0L)
    // after a minor compaction the view shows the merged layout
    spark.sql("CALL cat_test.system.compact_minor(table => 'mf')")
    val after = spark.sql(
      "SELECT count(*) AS c, sum(rows) AS r FROM cat_test.`mf$files`")
      .collect().head
    assert(after.getAs[Long]("c") === 1L && after.getAs[Long]("r") === 40L)
    spark.sql("DROP TABLE cat_test.mf")
  }

  test("SQL time travel: VERSION AS OF reads a snapshot of the log") {
    ensureCatalog()
    spark.sql(
      "CREATE TABLE cat_test.tt (k STRING, n BIGINT) USING kvtable")
    spark.sql("INSERT INTO cat_test.tt (k, n) VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT INTO cat_test.tt (k, n) VALUES ('a', 10), ('c', 3)")

    // snapshot at batch 1: only the first insert's rows are visible,
    // even though the query never projects __version
    val v1 = spark.sql(
      "SELECT k, n FROM cat_test.tt VERSION AS OF 1 ORDER BY k")
      .as[(String, Long)].collect()
    assert(v1 === Array(("a", 1L), ("b", 2L)))

    // snapshot at the head equals the live raw log
    assert(spark.sql("SELECT * FROM cat_test.tt VERSION AS OF 2").count()
      === spark.table("cat_test.tt").count())

    // LWW over the snapshot equals readAsOf
    val path = s"$warehouse/tt"
    val schema = KvTable.readSchema(spark, path)
    val snapLww = KvTable.lwwView(
      spark.sql("SELECT * FROM cat_test.tt VERSION AS OF 1"), schema)
      .orderBy("k").as[(String, Long)].collect()
    val asOf = KvTable.readAsOf(spark, path, 1L)
      .orderBy("k").as[(String, Long)].collect()
    assert(snapLww === asOf)

    // snapshots are read-only; non-numeric versions are a clear error
    intercept[Exception] {
      spark.sql("INSERT INTO cat_test.tt VERSION AS OF 1 VALUES ('x', 9)")
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM cat_test.tt VERSION AS OF 'yesterday'").count()
    }

    // the snapshot bound PRUNES at planning: batch-2 row groups (their
    // manifest __version min > 1) never become partitions
    val full = new KvScanBuilder(path, spark.table("cat_test.tt").schema)
      .build().toBatch.planInputPartitions().length
    val snap = new KvScanBuilder(path, spark.table("cat_test.tt").schema,
      asOf = Some(1L)).build().toBatch.planInputPartitions().length
    assert(snap < full, s"snapshot planned $snap of $full partitions")

    spark.sql("DROP TABLE cat_test.tt")
  }

  test("ALTER TABLE ADD/DROP COLUMNS: metadata-only schema evolution") {
    ensureCatalog()
    spark.sql(
      "CREATE TABLE cat_test.ev (k STRING, v STRING) USING kvtable " +
        "TBLPROPERTIES ('kv.key'='k')")
    spark.sql("INSERT INTO cat_test.ev (k, v) VALUES ('a','1'), ('b','2')")

    // add a column with an explicit (family, qualifier) via COMMENT;
    // existing rows read it as null — no file was rewritten
    spark.sql(
      "ALTER TABLE cat_test.ev ADD COLUMNS (n BIGINT COMMENT 'right:num')")
    val path = s"$warehouse/ev"
    assert(KvTable.readSchema(spark, path).field("n").family === "right")
    assert(KvTable.readSchema(spark, path).field("n").qualifier === "num")
    assert(spark.table("cat_test.ev").filter(col("n").isNull).count() === 2)

    // new writes carry the column; LWW view merges old and new shapes
    spark.sql("INSERT INTO cat_test.ev (k, v, n) VALUES ('a','1x',10)")
    val lww = KvTable.lwwView(spark.table("cat_test.ev"),
      KvTable.readSchema(spark, path)).orderBy("k")
      .as[(String, String, Option[Long])].collect()
    assert(lww === Array(("a", "1x", Some(10L)), ("b", "2", None)))

    // drop hides the column (files untouched); the rowkey is protected
    spark.sql("ALTER TABLE cat_test.ev DROP COLUMN n")
    assert(!spark.table("cat_test.ev").columns.contains("n"))
    intercept[Exception] {
      spark.sql("ALTER TABLE cat_test.ev DROP COLUMN k")
    }
    spark.sql("DROP TABLE cat_test.ev")
  }

  test("INSERT OVERWRITE truncates driver-side (Replace semantics)") {
    ensureCatalog()
    spark.sql(
      "CREATE TABLE cat_test.ovr (k STRING, n BIGINT) USING kvtable")
    spark.sql("INSERT INTO cat_test.ovr (k, n) VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT OVERWRITE cat_test.ovr (k, n) VALUES ('c', 3)")
    assert(spark.table("cat_test.ovr").select("k").as[String].collect()
      === Array("c"))
    spark.sql("DROP TABLE cat_test.ovr")
  }
}
