package graft.kv

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

/** HBase-Increment-style counter semantics over the KvTable log:
  * commutative delta accumulation, tombstone reset (masks version <=
  * tombstone version), absence vs present-zero, and major compaction
  * that materializes totals without changing any read.
  */
class KvCounterSpec extends SparkSpec {
  import spark.implicits._

  private def readMap(path: String): Map[String, Long] =
    KvCounter.read(spark, path)
      .as[(String, Long)].collect().toMap

  test("deltas accumulate across and within batches; negatives decrement") {
    val path = TestSpark.scratch("kvctr")
    KvCounter.increment(Seq(("a", 5L), ("a", 3L), ("b", 10L))
      .toDF("k", "delta"), path, "k", SinkMode.Replace)
    KvCounter.increment(Seq(("a", 2L), ("b", -4L), ("c", 7L))
      .toDF("k", "delta"), path, "k")
    assert(readMap(path) === Map("a" -> 10L, "b" -> 6L, "c" -> 7L))
  }

  test("delete masks prior deltas; later increments restart; +5/-5 reads " +
    "as a present zero, a fully-deleted key as absent") {
    val path = TestSpark.scratch("kvctr")
    KvCounter.increment(Seq(("a", 5L), ("b", 9L), ("z", 5L))
      .toDF("k", "delta"), path, "k", SinkMode.Replace)
    KvCounter.increment(Seq(("z", -5L)).toDF("k", "delta"), path, "k")
    KvCounter.delete(Seq("a", "b").toDF("k"), path)
    KvCounter.increment(Seq(("a", 2L)).toDF("k", "delta"), path, "k")
    // a restarted at 2; b fully deleted -> absent; z present with value 0
    assert(readMap(path) === Map("a" -> 2L, "z" -> 0L))
  }

  test("compact materializes totals (one cell per key, no tombstones), " +
    "preserves the read view and the version counter") {
    val path = TestSpark.scratch("kvctr")
    KvCounter.increment(Seq(("a", 5L), ("a", 3L), ("b", 10L), ("c", 1L))
      .toDF("k", "delta"), path, "k", SinkMode.Replace)
    KvCounter.delete(Seq("c").toDF("k"), path)
    KvCounter.increment(Seq(("a", 1L)).toDF("k", "delta"), path, "k")
    val before = readMap(path)

    KvCounter.compact(spark, path)
    assert(readMap(path) === before)
    val raw = KvTable.readRaw(spark, path)
    assert(raw.count() === 2)                                 // a, b only
    assert(raw.filter(col(KvTable.TombstoneCol)).count() === 0)

    // the preserved counter means later ops still dominate: delete all,
    // then a fresh increment restarts from zero
    KvCounter.delete(Seq("a", "b").toDF("k"), path)
    KvCounter.increment(Seq(("b", 4L)).toDF("k", "delta"), path, "k")
    assert(readMap(path) === Map("b" -> 4L))
  }

  test("event-time version domain: a tombstone between event versions " +
    "masks only at-or-below itself") {
    val path = TestSpark.scratch("kvctr")
    // deltas at event-times 100 and 300
    KvCounter.increment(Seq(("a", 5L, 100L), ("a", 7L, 300L))
      .toDF("k", "delta", "et"), path, "k", SinkMode.Replace,
      versionFrom = Some(col("et")))
    // delete stamped at event-time 200: masks the 100-delta only
    KvCounter.delete(Seq("a").toDF("k"), path, version = Some(200L))
    assert(readMap(path) === Map("a" -> 7L))
  }
}
