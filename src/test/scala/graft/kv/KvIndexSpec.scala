package graft.kv

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

class KvIndexSpec extends SparkSpec {
  import spark.implicits._

  private val schema = KvSchema.of("k", "status" -> ("f", "s"),
    "amt" -> ("f", "a"))

  test("build + lookup serve a value-equality query from the index") {
    val primary = TestSpark.scratch("kvidx-primary")
    val index = TestSpark.scratch("kvidx-index")
    KvTable.write(Seq(("k1", "A", 1L), ("k2", "A", 2L), ("k3", "B", 3L))
      .toDF("k", "status", "amt"), primary, schema, SinkMode.Replace)
    KvIndex.build(spark, primary, index, "status")
    assert(KvIndex.lookupKeys(spark, index, "A").as[String].collect().sorted
      === Array("k1", "k2"))
    assert(KvIndex.lookup(spark, primary, index, "A")
      .select("k", "amt").as[(String, Long)].collect().sortBy(_._1)
      === Array(("k1", 1L), ("k2", 2L)))
    // no phantom match across the separator (value prefix of another)
    assert(KvIndex.lookupKeys(spark, index, "").as[String].collect().isEmpty)
  }

  test("indexed values containing NUL/SOH do not leak into another " +
    "value's prefix range (byte-stuffed composite keys)") {
    val primary = TestSpark.scratch("kvidx-nul-primary")
    val index = TestSpark.scratch("kvidx-nul-index")
    // "a\u0000x" would sort inside the naive range [a\0, a\1); "a\u0001"
    // would collide with the range's upper bound
    KvTable.write(
      Seq(("k1", "a", 1L), ("k2", "a\u0000x", 2L), ("k3", "a\u0001", 3L))
        .toDF("k", "status", "amt"),
      primary, schema, SinkMode.Replace)
    KvIndex.build(spark, primary, index, "status")
    assert(KvIndex.lookupKeys(spark, index, "a").as[String].collect()
      === Array("k1"))
    assert(KvIndex.lookupKeys(spark, index, "a\u0000x").as[String].collect()
      === Array("k2"))
    assert(KvIndex.lookupKeys(spark, index, "a\u0001").as[String].collect()
      === Array("k3"))
    assert(KvIndex.lookup(spark, primary, index, "a")
      .select("k").as[String].collect() === Array("k1"))
  }

  test("refresh works on event-time-versioned (versionFrom) primaries: " +
    "the checkpoint lives in the row-version domain") {
    val primary = TestSpark.scratch("kvidx-ev-primary")
    val index = TestSpark.scratch("kvidx-ev-index")
    // versions are event times (~1e9 scale), NOT the meta batch counter
    KvTable.write(
      Seq(("k1", "A", 1000000000L), ("k2", "A", 1000000000L))
        .toDF("k", "status", "ver").withColumn("amt", lit(0L)),
      primary, schema, SinkMode.Replace, versionFrom = Some(col("ver")))
    KvIndex.build(spark, primary, index, "status")
    // k1 moves A -> B at a newer event time
    KvTable.write(
      Seq(("k1", "B", 2000000000L)).toDF("k", "status", "ver")
        .withColumn("amt", lit(0L)),
      primary, schema, SinkMode.Append, versionFrom = Some(col("ver")))
    KvIndex.refresh(spark, primary, index)
    // the stale "A\0k1" entry must be retracted (the pre-image read at
    // the checkpoint must see the event-time snapshot)
    assert(KvIndex.lookupKeys(spark, index, "A").as[String].collect().sorted
      === Array("k2"))
    assert(KvIndex.lookupKeys(spark, index, "B").as[String].collect()
      === Array("k1"))
  }

  test("covered lookup is index-only: answers after the primary is gone") {
    val primary = TestSpark.scratch("kvidx3-primary")
    val index = TestSpark.scratch("kvidx3-index")
    KvTable.write(Seq(("k1", "A", 1L), ("k2", "A", 2L), ("k3", "B", 3L))
      .toDF("k", "status", "amt"), primary, schema, SinkMode.Replace)
    KvIndex.build(spark, primary, index, "status", covered = Seq("amt"))
    // refresh keeps covered values current
    KvTable.write(Seq(("k2", "A", 20L)).toDF("k", "status", "amt"),
      primary, schema, SinkMode.Append)
    KvIndex.refresh(spark, primary, index)
    // drop the primary entirely: a covered lookup must still answer
    KvTable.drop(spark, primary)
    assert(KvIndex.lookupCovered(spark, index, "A")
      .as[(String, Long)].collect().sortBy(_._1)
      === Array(("k1", 1L), ("k2", 20L)))
  }

  test("refresh is CDC-incremental: updates move entries, deletes " +
    "retract them, result equals a fresh rebuild") {
    val primary = TestSpark.scratch("kvidx2-primary")
    val index = TestSpark.scratch("kvidx2-index")
    KvTable.write(Seq(("k1", "A", 1L), ("k2", "A", 2L), ("k3", "B", 3L))
      .toDF("k", "status", "amt"), primary, schema, SinkMode.Replace)
    KvIndex.build(spark, primary, index, "status")
    // mutate the primary: k1 A->B, k2 deleted, k4 added with A
    KvTable.write(Seq(("k1", "B", 10L), ("k4", "A", 4L))
      .toDF("k", "status", "amt"), primary, schema, SinkMode.Append)
    KvTable.delete(Seq("k2").toDF("k"), primary, schema)
    KvIndex.refresh(spark, primary, index)
    assert(KvIndex.lookupKeys(spark, index, "A").as[String].collect().sorted
      === Array("k4"))
    assert(KvIndex.lookupKeys(spark, index, "B").as[String].collect().sorted
      === Array("k1", "k3"))
    // the refreshed index's live view equals a from-scratch rebuild
    val rebuilt = TestSpark.scratch("kvidx2-rebuilt")
    KvIndex.build(spark, primary, rebuilt, "status")
    assert(KvTable.read(spark, index).collect().toSet ===
      KvTable.read(spark, rebuilt).collect().toSet)
    // a refresh with no new mutations is a no-op that stays consistent
    KvIndex.refresh(spark, primary, index)
    assert(KvIndex.lookupKeys(spark, index, "B").as[String].collect().sorted
      === Array("k1", "k3"))
  }
}
