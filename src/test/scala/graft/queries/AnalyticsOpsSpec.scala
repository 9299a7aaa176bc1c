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

  test("q_gapfill repairs a planted gap: zero-fill, LOCF from the left " +
      "neighbor, and the interpolation rational reconstructs the line") {
    // one type, hours 0..3 of 2024-01-01 with hour 2 EMPTY; cents sums
    // 100, 200, (gap), 500 — interp at the gap must be the exact
    // rational (200*(3-2) + 500*(2-1)) / (3-1) = 700/2; rows written
    // directly (eventsDir's value formula is too coarse here)
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.00, "{}"),
      (2L, "2024-01-01 01:10:00", 1L, "click", 2.00, "{}"),
      (3L, "2024-01-01 03:10:00", 1L, "click", 5.00, "{}"))
    import spark.implicits._
    val dir2 = graft.TestSpark.scratch("gapfill-events")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .col("ts_s").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val out = SparkEntry.queries("q_gapfill")(spark, dir2)
      .collect().map(r => r.getAs[Long]("pos") -> r).toMap
    val base = out.keys.min
    val gap = out(base + 2)
    assert(gap.getAs[Long]("n_filled") === 0L)
    assert(gap.getAs[Long]("locf_cents") === 200L)
    assert(gap.getAs[Long]("interp_num") === 700L)
    assert(gap.getAs[Long]("interp_den") === 2L)
    // present rows carry themselves: num/den = cents/1
    assert(out(base + 1).getAs[Long]("interp_num") === 200L)
    assert(out(base + 1).getAs[Long]("interp_den") === 1L)
  }

  test("ann_mmr keeps each query's most relevant hit and diversifies " +
      "the rest (picks differ from pure top-k for at least one query)") {
    val dir = "/root/testdata/sf0.001"
    val mmr = SparkEntry.queries("ann_mmr")(spark, dir).collect()
    val topk = SparkEntry.queries("ann_topk")(spark, dir).collect()
    val mmrTop = mmr.filter(_.getAs[Int]("mmr_rank") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap
    val relTop = topk.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap
    assert(mmrTop === relTop,
      "MMR must never displace the single most relevant hit")
    val mmrSets = mmr.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    val topkSets = topk.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    assert(mmrSets.exists { case (q, s) => s != topkSets(q) },
      "diversification changed nothing — suspicious for this corpus")
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
