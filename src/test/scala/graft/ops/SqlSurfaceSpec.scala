package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The SQL entry points a user of the engine actually types:
  * session-extension injection (GraftExtensions) must expose BOTH the
  * scalar natives and the EXT table functions without any per-session
  * register call, and the table-function surface must equal the
  * DataFrame surface row-for-row (one operator, two spellings). */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("table functions and the DataFrame operators return identical " +
      "rows (graft_bm25 / graft_passage_dedup)") {
    graft.functions.Native.register(spark)
    graft.functions.TableFns.register(spark)
    val viaSql = spark.sql(
      s"SELECT * FROM graft_bm25('$dir/documents.parquet', " +
        "'merge vector slow', 20)").collect().toSeq
    val viaDf = graft.text.TextOps.bm25TopK(
        spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", Seq("merge", "vector", "slow"), 20)
      .collect().toSeq
    assert(viaSql === viaDf)
    val dedupSql = spark.sql(
      s"SELECT * FROM graft_passage_dedup('$dir/documents.parquet', 16) " +
        "ORDER BY doc_id").collect().toSeq
    val dedupDf = graft.dedup.Dedup.passageDedupStats(
        spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", 16)
      .orderBy("doc_id").collect().toSeq
    assert(dedupSql === dedupDf)
  }

  test("a non-literal table-function argument is rejected with the " +
      "usage message, not a null binding") {
    graft.functions.TableFns.register(spark)
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25('$dir/documents.parquet', " +
        "'merge', CAST(rand() * 5 AS INT))").collect()
    }
    assert(ex.getMessage.contains("literal"), ex.getMessage)
  }

  test("GraftExtensions injects scalar AND table functions into a " +
      "fresh extension-configured session") {
    // getOrCreate would hand back the suite's shared session (and
    // ignore withExtensions) while the sessions are set — clear them,
    // build a genuinely NEW session over the existing SparkContext,
    // and NEVER stop it (stop() kills the shared context).
    val defBefore = SparkSession.getDefaultSession
    val actBefore = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-probe")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark, "probe session must be new or the test is vacuous")
      // scalar native: no register() call anywhere on s2
      val n = s2.sql(
        "SELECT graft_simhash64(array(1L, 2L, 3L)) AS h").collect()
      assert(n.length === 1)
      // table function through plain SQL
      val rows = s2.sql(
        s"SELECT * FROM graft_passage_dedup('$dir/documents.parquet', 16)")
        .collect()
      assert(rows.length > 0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      defBefore.foreach(SparkSession.setDefaultSession)
      actBefore.foreach(SparkSession.setActiveSession)
    }
  }
}
