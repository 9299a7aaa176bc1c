package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.SparkSpec

/** Regression guard for the r11 cube/rollup pre-aggregate-before-EXPAND
  * rewrite (VERDICT r11 "What's wrong" #4): proves the pre-agg spelling
  * equals the raw spelling EVEN WHEN dimension columns contain nulls.
  * Data-null dimension values survive the pre-groupBy as ordinary
  * groups, and cube/rollup EXPAND keys include grouping_id, so a data
  * null never conflates with a subtotal marker; counts/DECIMAL sums
  * re-aggregate associatively. */
class CubePreAggSpec extends SparkSpec {
  private val dec = DecimalType(18, 2)

  private def df = {
    import spark.implicits._
    Seq(
      (Option("A"), Option(1), 10.0), (Option("A"), Option(1), 2.5),
      (Option("A"), None, 7.0), (None, Option(1), 1.25),
      (None, None, 4.0), (Option("B"), Option(2), 3.0),
      (None, Option(2), 8.0), (Option("B"), None, 0.5))
      .toDF("d1", "d2", "x")
  }

  test("cube over pre-aggregated domain equals raw cube with null dims") {
    val raw = df.cube(col("d1"), col("d2"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("d1"), asc_nulls_first("d2"))
      .collect().toSeq
    val pre = df.groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("__n"), sum(col("x").cast(dec)).as("__x"))
      .cube(col("d1"), col("d2"))
      .agg(sum(col("__n")).cast("long").as("n"),
        sum(col("__x")).cast("double").as("sx"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("d1"), asc_nulls_first("d2"))
      .collect().toSeq
    assert(pre === raw)
  }

  test("rollup over pre-aggregated domain equals raw rollup with null dims") {
    val raw = df.rollup(col("d1"), col("d2"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("d1"), asc_nulls_first("d2"))
      .collect().toSeq
    val pre = df.groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("__n"), sum(col("x").cast(dec)).as("__x"))
      .rollup(col("d1"), col("d2"))
      .agg(sum(col("__n")).cast("long").as("n"),
        sum(col("__x")).cast("double").as("sx"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("d1"), asc_nulls_first("d2"))
      .collect().toSeq
    assert(pre === raw)
  }
}
