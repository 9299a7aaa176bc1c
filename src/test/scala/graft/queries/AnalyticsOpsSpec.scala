package graft.queries

import java.sql.Timestamp

import graft.{SparkSpec, TestSpark}
import graft.SparkEntry

/** Behavioral pins for the analytics operators on SYNTHETIC series
  * with known answers — the oracle gate proves Spark==DuckDB on the
  * driver's testdata; these prove the operators compute the intended
  * statistic at all (a detector that is cross-engine-consistently
  * wrong would pass the gate).
  */
class AnalyticsOpsSpec extends SparkSpec {

  /** Write a synthetic events.parquet into a scratch sf-dir: one row
    * per (type, day, i<count), timestamps at day-midnight + i seconds,
    * user ids cycling 0..9. */
  private def eventsDir(series: Seq[(String, String, Int)]): String = {
    import scala.jdk.CollectionConverters._
    val dir = TestSpark.scratch("analytics-events")
    val rows = series.flatMap { case (tpe, day, cnt) =>
      (0 until cnt).map { i =>
        org.apache.spark.sql.Row(
          (day.hashCode.toLong << 16) + i, // event_id: unique enough
          Timestamp.valueOf(s"$day 00:00:${i % 60}"),
          (i % 10).toLong, tpe, 1.0 + i, "{}")
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_changepoint finds a planted level shift at the regime " +
      "boundary (last low-regime day maximizes the CUSUM distance)") {
    // clicks: 10/day Jan 1-9, 40/day Jan 10-18 — a 4x shift at Jan 10
    val days = (1 to 18).map(d => f"2024-01-$d%02d")
    val dir = eventsDir(days.map(d =>
      ("click", d, if (d < "2024-01-10") 10 else 40)))
    val out = SparkEntry.queries("q_changepoint")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("click") === "2024-01-09",
      s"changepoint missed the planted boundary: $out")
  }

  test("q_changepoint is flat-series stable: a constant series still " +
      "returns one deterministic row per type (earliest-day tiebreak)") {
    val days = (1 to 6).map(d => f"2024-01-$d%02d")
    val dir = eventsDir(days.map(d => ("view", d, 7)))
    val rows = SparkEntry.queries("q_changepoint")(spark, dir).collect()
    assert(rows.length === 1)
    // n*S_i - i*S_n == 0 for every split of a constant series
    assert(rows.head.getAs[Long]("max_score") === 0L)
    assert(rows.head.getAs[String]("cp_day") === "2024-01-01")
  }

  test("q_abtest splits by user parity and counts conversions exactly") {
    // users 0..9 (parity arms of 5); conversion needs value >= 150 —
    // plant 200 clicks (never converts) and purchases with i up to 199
    // so users receive deterministic high-value purchases
    val dir = eventsDir(Seq(("click", "2024-01-01", 200),
      ("purchase", "2024-01-02", 200)))
    val r = SparkEntry.queries("q_abtest")(spark, dir).collect().head
    assert(r.getAs[Long]("n_a") === 5 && r.getAs[Long]("n_b") === 5)
    // purchase values are 1.0+i, i in [0,199]; value>=150 → i>=149;
    // i%10 cycles users, so users 9,0,1,...,8 all get one → everyone
    // converts except nobody... i in [149,199] covers all residues →
    // all 10 users convert; degenerate pool → z_score NULL
    assert(r.getAs[Long]("conv_a") === 5 && r.getAs[Long]("conv_b") === 5)
    assert(r.isNullAt(r.fieldIndex("z_score")),
      "saturated pool must yield NULL z_score, not a division error")
  }
}
