package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable}

class KvStreamSpec extends SparkSpec {
  import spark.implicits._

  test("kvtable streaming SOURCE: new log files become micro-batches; " +
    "a checkpointed restart reads only files added since its offset") {
    import org.apache.spark.sql.streaming.Trigger
    val src = TestSpark.scratch("kv-stream-src")
    val ckpt = TestSpark.scratch("kv-stream-src-ckpt")
    val schema = KvSchema.of("k", "n" -> ("f", "n"))
    KvTable.write(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"),
      src, schema, graft.kv.SinkMode.Replace)
    KvTable.write(Seq(("c", 3L)).toDF("k", "n"), src, schema)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("kvtable").load(src)
        .filter(!col(KvTable.TombstoneCol))
        .select("k", "n")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.as[(String, Long)].collect() }; ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(seen.sorted === Seq(("a", 1L), ("b", 2L), ("c", 3L)))

    // append more mutations (an upsert and a tombstone), re-drain from
    // the SAME checkpoint: only the new files' rows arrive
    seen.clear()
    KvTable.write(Seq(("b", 20L)).toDF("k", "n"), src, schema)
    KvTable.delete(Seq("a").toDF("k"), src, schema)
    drain()
    assert(seen.sorted === Seq(("b", 20L)), // tombstone row filtered out
      s"restart must deliver only new live rows, got $seen")

    // nothing new -> empty (possibly zero) batches
    seen.clear()
    drain()
    assert(seen.isEmpty)
  }

  test("micro-batch stream upserts into a KvTable: each batch is a flow run") {
    // Streaming analog of the reference's APPEND cascade re-run
    // (13 -> 26 raw rows but LWW-distinct keys; here: same 5 keys
    // upserted twice, second batch wins).
    val path = TestSpark.scratch("kv-stream")
    val schema = KvSchema.of("k", "v" -> ("f", "v"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = KvStream.kvUpsertWriter(
      input.toDF().toDF("k", "v"), path, schema)
      .start()
    try {
      input.addData(("1", "a"), ("2", "b"), ("3", "c"))
      q.processAllAvailable()
      assert(KvTable.read(spark, path).count() === 3)
      input.addData(("2", "B2"), ("4", "d"))
      q.processAllAvailable()
      val rows = KvTable.read(spark, path).orderBy("k")
        .as[(String, String)].collect()
      assert(rows === Array(("1", "a"), ("2", "B2"), ("3", "c"), ("4", "d")))
      assert(KvTable.readRaw(spark, path).count() === 5) // log keeps history
    } finally q.stop()
  }

  test("watermarked tumbling-window aggregation over event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "key", "value")
    val agg = KvStream.windowedAgg(events, "ts", "10 minutes", "30 minutes",
      col("key"))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Update()).start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((ts(1), "a", 1.0), (ts(4), "a", 2.0), (ts(12), "a", 5.0))
      q.processAllAvailable()
      val out = spark.table("winagg")
        .select(col("window.start").cast("string"), col("key"), col("n"), col("total"))
        .as[(String, String, Long, Double)].collect().sortBy(_._1)
      assert(out.map(r => (r._3, r._4)).toSeq === Seq((2L, 3.0), (1L, 5.0)))
    } finally q.stop()
  }

  test("watermarked session window in APPEND mode emits only closed sessions") {
    // The bounded-state production shape stream_sessionize's complete
    // mode documents as its 100 TB variant: with a watermark, append
    // mode emits a session only once the watermark passes its end —
    // state for closed sessions is dropped, late data beyond the
    // watermark is discarded.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val sessions = input.toDS().toDF("t", "k")
      .withWatermark("t", "10 minutes")
      .groupBy(col("k"), session_window(col("t"), "5 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("sw.start").cast("string").as("start"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), "a"), (ts(2), "a"), (ts(20), "a"))
      q.processAllAvailable()
      // watermark (20:00 - 10m = 10:00) passed the first session's end
      // (02:00 + 5m): it is emitted and its state dropped; the 20:00
      // session stays open and unemitted.
      val emitted = spark.table("sess").as[(String, String, Long)].collect()
      assert(emitted.toSeq === Seq(("a", "2024-01-01 10:00:00", 2L)))
      // advance far enough to close the second session too
      input.addData((ts(59), "a"))
      q.processAllAvailable()
      val all = spark.table("sess").as[(String, String, Long)].collect().sortBy(_._2)
      assert(all.map(r => (r._2, r._3)).toSeq ===
        Seq(("2024-01-01 10:00:00", 2L), ("2024-01-01 10:20:00", 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions close on observed gaps AND on " +
    "event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = input.toDS().toDF("user_id", "t")
      .withWatermark("t", "5 minutes")
      .select(col("user_id"), col("t"))
      .as[(Long, java.sql.Timestamp)]
    val sessions = KvStream.expiringSessions(ev, gapUs = 600L * 1000000L)
    val q = sessions.writeStream.format("memory").queryName("exsess")
      .outputMode(OutputMode.Append()).start()
    try {
      // u1: two events 2min apart, then one 15min later (> 10min gap):
      // the first session closes ON DATA in the same batch
      input.addData((1L, ts(0)), (1L, ts(2)), (1L, ts(17)), (2L, ts(17)))
      q.processAllAvailable()
      val first = spark.table("exsess")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      assert(first.toSeq === Seq((1L, ts(0), ts(12), 2L)),
        s"data-gap close mismatch: ${first.toSeq}")
      // advance the watermark past last+gap for both open sessions:
      // wm = 45 - 5 = 10:40 > 17 + 10 = 10:27 -> both TIME OUT and emit
      input.addData((3L, ts(45)))
      q.processAllAvailable()
      val all = spark.table("exsess")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
        .sortBy(r => (r._1, r._2.getTime))
      assert(all.toSeq === Seq(
        (1L, ts(0), ts(12), 2L),
        (1L, ts(17), ts(27), 1L),
        (2L, ts(17), ts(27), 1L)))
      // u3's session (last=10:45) stays open: watermark never passed it
      assert(!all.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-key state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val stats = KvStream.runningStats(input.toDS())
    val q = stats.writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(("u1", 1.0), ("u1", 7.0), ("u2", 3.0))
      q.processAllAvailable()
      input.addData(("u1", 4.0))
      q.processAllAvailable()
      val last = spark.table("running").as[(String, Long, Double)].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
      assert(last("u1") === (("u1", 3L, 7.0)))
      assert(last("u2") === (("u2", 1L, 3.0)))
    } finally q.stop()
  }
}
