package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Pins the bit-identity claim of the adaptively chunked running window
  * (`RelationalQueries.windowFuncsChunked`, the round-6 skew fix for
  * `q_window_funcs`): for ANY choice of hot keys — not just the ones the
  * count probe would pick — the two-phase per-(key, month) chunked form
  * must equal the plain one-window form row for row, because the carried
  * aggregates (row count, decimal sum, previous chunk's last row) are
  * exact. The skewed-sf1 oracle gate proves this once per campaign on
  * real data; this spec proves it on every `sbt test` over adversarial
  * shapes: month boundaries, same-date orderkey tiebreaks, single-month
  * hot keys, hot-marked keys with one row, and randomized corpora. */
class ChunkedWindowSpec extends SparkSpec {

  private val dec = DecimalType(18, 2)

  private def plainWindow(base: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("running_total",
        sum(col("o_totalprice").cast(dec))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  private def df(rows: Seq[(Long, Long, String, Double)]): DataFrame = {
    import graft.TestSpark.spark.implicits._
    rows.toDF("o_custkey", "o_orderkey", "d", "p")
      .select(col("o_custkey"), col("o_orderkey"),
        to_timestamp(col("d")).as("o_orderdate"),
        col("p").cast(dec).as("o_totalprice"))
  }

  private def hot(keys: Long*): DataFrame = {
    import graft.TestSpark.spark.implicits._
    keys.toDF("o_custkey").select(col("o_custkey"), lit(true).as("__hot"))
  }

  private def assertIdentical(base: DataFrame, hotKeys: DataFrame): Unit = {
    val want = plainWindow(base).collect().map(_.toSeq)
    val got = RelationalQueries.windowFuncsChunked(base, hotKeys)
      .collect().map(_.toSeq)
    assert(got.length === want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"row $i diverged: chunked $g vs plain $w")
    }
  }

  test("chunk boundaries, tiebreaks and degenerate hot keys are exact") {
    val base = df(Seq(
      // hot key 1: three months, a month-boundary pair, same-date
      // orderkey tiebreak at a chunk head
      (1L, 10L, "1995-01-03", 10.00), (1L, 11L, "1995-01-31", 20.50),
      (1L, 12L, "1995-02-01", 30.25), (1L, 13L, "1995-02-01", 40.75),
      (1L, 14L, "1995-03-15", 50.00),
      // hot-marked key 2: single month (one chunk — carry must be null)
      (2L, 20L, "1995-05-02", 5.00), (2L, 21L, "1995-05-09", 6.00),
      // hot-marked key 3: ONE row
      (3L, 30L, "1995-06-01", 7.00),
      // cold key 4: multi-month data that must stay un-chunked
      (4L, 40L, "1995-01-10", 1.00), (4L, 41L, "1995-07-10", 2.00)))
    assertIdentical(base, hot(1L, 2L, 3L))
  }

  test("empty hot set and all-hot set both reproduce the plain window") {
    val base = df(Seq(
      (1L, 1L, "1996-01-01", 3.00), (1L, 2L, "1996-02-01", 4.00),
      (2L, 3L, "1996-01-15", 5.00)))
    assertIdentical(base, hot())
    assertIdentical(base, hot(1L, 2L))
  }

  test("randomized corpora match for arbitrary hot subsets") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 3).foreach { _ =>
      val rows = (1L to 400L).map { ok =>
        val k = rnd.nextInt(6).toLong
        val month = 1 + rnd.nextInt(11)
        val day = 1 + rnd.nextInt(28)
        (k, ok, f"1997-$month%02d-$day%02d",
          (rnd.nextInt(100000) + 1) / 100.0)
      }
      val hotKeys = hot((0L to 5L).filter(_ => rnd.nextBoolean()): _*)
      assertIdentical(df(rows), hotKeys)
    }
  }
}
