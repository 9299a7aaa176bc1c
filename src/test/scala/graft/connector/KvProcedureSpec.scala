package graft.connector

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable, SinkMode}

/** SQL admin verbs for the round-3 maintenance surface: `CALL
  * system.zorder` (multi-dimensional clustering) and `CALL
  * system.create_matview` / `system.refresh_matview` (incremental
  * summary views) — the Iceberg/Delta-style procedure surface over the
  * path-based APIs specced in KvZOrderSpec / KvMatViewSpec.
  */
class KvProcedureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = TestSpark.scratch("kvproc-wh")

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.cat_proc", "graft.connector.KvCatalog")
    spark.conf.set("spark.sql.catalog.cat_proc.warehouse", warehouse)
  }

  test("CALL system.zorder clusters a table through SQL") {
    ensureCatalog()
    val schema = KvSchema.of("k", "x" -> ("f", "x"), "y" -> ("f", "y"))
    val rnd = new scala.util.Random(3)
    KvTable.write(
      rnd.shuffle((0 until 256).toList)
        .map(i => (i.toLong, (i % 16).toLong, (i / 16).toLong))
        .toDF("k", "x", "y"),
      s"$warehouse/zt", schema, SinkMode.Replace)
    spark.sql(
      "CALL cat_proc.system.zorder(table => 'zt', columns => 'x,y', " +
        "cells => 8)")
    val got = KvTable.read(spark, s"$warehouse/zt")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length === 256 && got(17) === ((17L, 1L, 1L)))
    // clustered layout: a 1-dim predicate prunes row-group partitions
    val raw = spark.read.format("kvtable").load(s"$warehouse/zt")
    val total = raw.select("k", "x").rdd.getNumPartitions
    if (total > 1)
      assert(raw.filter($"x" === 0).select("k", "x")
        .rdd.getNumPartitions < total)
  }

  test("CALL system.create_matview + refresh_matview maintain a summary " +
    "view through SQL") {
    ensureCatalog()
    val schema = KvSchema.of("k", "grp" -> ("f", "g"), "amt" -> ("f", "a"))
    KvTable.write(
      Seq(("k1", "A", 1L), ("k2", "A", 2L), ("k3", "B", 3L))
        .toDF("k", "grp", "amt"),
      s"$warehouse/mb", schema, SinkMode.Replace)
    spark.sql(
      "CALL cat_proc.system.create_matview(base => 'mb', view => 'mv', " +
        "group_col => 'grp', sum_cols => 'amt')")
    def view() = KvTable.read(spark, s"$warehouse/mv")
      .select("grp", "cnt", "sum_amt").as[(String, Long, Long)]
      .collect().sortBy(_._1)
    assert(view() === Array(("A", 2L, 3L), ("B", 1L, 3L)))

    KvTable.write(Seq(("k4", "B", 10L), ("k1", "B", 5L))
      .toDF("k", "grp", "amt"), s"$warehouse/mb", schema, SinkMode.Append)
    spark.sql(
      "CALL cat_proc.system.refresh_matview(base => 'mb', view => 'mv')")
    assert(view() === Array(("A", 1L, 2L), ("B", 3L, 18L)))

    // unknown procedure still errors helpfully
    val err = intercept[Exception] {
      spark.sql("CALL cat_proc.system.nope(table => 'mb')")
    }
    assert(err.getMessage.contains("nope") ||
      err.getMessage.toLowerCase.contains("procedure"))
  }
}
