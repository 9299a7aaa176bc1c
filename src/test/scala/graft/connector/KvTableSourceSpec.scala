package graft.connector

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable, SinkMode}

class KvTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeTwoBatches(): String = {
    val path = TestSpark.scratch("v2-table")
    val schema = KvSchema.of("k", "v" -> ("f", "v"), "n" -> ("f", "n"))
    // Two writes -> at least two files with disjoint key ranges.
    val low = Seq(("a1", "x", 1L), ("a2", "y", 2L)).toDF("k", "v", "n").coalesce(1)
    val high = Seq(("z8", "p", 8L), ("z9", "q", 9L)).toDF("k", "v", "n").coalesce(1)
    KvTable.write(low, path, schema, SinkMode.Replace)
    KvTable.write(high, path, schema, SinkMode.Append)
    path
  }

  test("format(kvtable) reads the raw log with engine columns") {
    val path = writeTwoBatches()
    val df = spark.read.format("kvtable").load(path)
    assert(df.columns.toSet ===
      Set("k", "v", "n", "__version", "__seq", "__tombstone"))
    val rows = df.select("k", "v", "n").orderBy("k")
      .as[(String, String, Long)].collect()
    assert(rows === Array(("a1", "x", 1L), ("a2", "y", 2L),
      ("z8", "p", 8L), ("z9", "q", 9L)))
    // matches the parquet-path read exactly
    val viaParquet = KvTable.readRaw(spark, path)
      .select("k", "v", "n").orderBy("k").as[(String, String, Long)].collect()
    assert(rows === viaParquet)
  }

  test("key-range filter prunes whole files from the plan (region pruning)") {
    val path = writeTwoBatches()
    val df = spark.read.format("kvtable").load(path)
    def partitions(d: org.apache.spark.sql.DataFrame): Int =
      d.rdd.getNumPartitions
    val all = partitions(df.select("k", "v"))
    val pruned = partitions(df.filter($"k" >= "z").select("k", "v"))
    assert(all >= 2)
    assert(pruned < all) // the low-key file never becomes a partition
    // correctness of the residual filter
    assert(df.filter($"k" >= "z").select("k").as[String].collect().sorted ===
      Array("z8", "z9"))
    // closed-open boundary: filter INSIDE a file's range keeps the file
    assert(df.filter($"k" >= "a2" && $"k" < "z9").select("k")
      .as[String].collect().sorted === Array("a2", "z8"))
  }

  test("column pruning reaches the scan description") {
    val path = writeTwoBatches()
    val df = spark.read.format("kvtable").load(path)
      .filter($"k" >= "z").select("v")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters"))
    assert(df.as[String].collect().sorted === Array("p", "q"))
  }

  test("V2 write path: append + overwrite-truncate round trip") {
    val path = TestSpark.scratch("v2-write")
    val schema = KvSchema.of("k", "v" -> ("f", "v"))
    KvTable.writeV2(Seq(("a", "1"), ("b", "2")).toDF("k", "v"), path, schema,
      graft.kv.SinkMode.Replace)
    assert(KvTable.read(spark, path).count() === 2)
    // append: upsert b, add c
    KvTable.writeV2(Seq(("b", "2x"), ("c", "3")).toDF("k", "v"), path, schema)
    val rows = KvTable.read(spark, path).orderBy("k")
      .as[(String, String)].collect()
    assert(rows === Array(("a", "1"), ("b", "2x"), ("c", "3")))
    // overwrite truncates driver-side: only the new generation remains
    KvTable.writeV2(Seq(("z", "9")).toDF("k", "v"), path, schema,
      graft.kv.SinkMode.Replace)
    assert(KvTable.read(spark, path).as[(String, String)].collect() ===
      Array(("z", "9")))
    // V2-written files are readable through the V2 scan too
    assert(KvTable.readV2(spark, path).as[(String, String)].collect() ===
      Array(("z", "9")))
  }

  test("V2 write stages invisibly and publishes atomically; Replace may change schema") {
    val path = TestSpark.scratch("v2-staging")
    val s1 = KvSchema.of("k", "v" -> ("f", "v"))
    KvTable.writeV2(Seq(("a", "1")).toDF("k", "v"), path, s1,
      graft.kv.SinkMode.Replace)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"$path/.staging")
    // after commit the staging area holds no files
    assert(!fs.exists(staging) || fs.listStatus(staging).forall(!_.isFile))
    // Replace with a DIFFERENT schema succeeds (drop + recreate contract)
    val s2 = KvSchema.of("k", "w" -> ("g", "w"))
    KvTable.writeV2(Seq(("x", 5L)).toDF("k", "w"), path, s2,
      graft.kv.SinkMode.Replace)
    assert(KvTable.readSchema(spark, path) === s2)
    assert(KvTable.read(spark, path).as[(String, Long)].collect() ===
      Array(("x", 5L)))
  }

  test("point get casts the probe to the stored key type (Int vs Long)") {
    val path = TestSpark.scratch("v2-getcast")
    val s = KvSchema.of("id", "v" -> ("f", "v"))
    KvTable.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, s, graft.kv.SinkMode.Replace)
    KvTable.compactBucketed(spark, path, 8)
    // probe with a Scala Int against the LongType key column
    assert(KvTable.get(spark, path, 42).as[(Long, String)].collect() ===
      Array((42L, "v42")))
    assert(KvTable.get(spark, path, 42L).as[(Long, String)].collect() ===
      Array((42L, "v42")))
  }

  test("long-key tables prune by numeric footer stats") {
    val path = TestSpark.scratch("v2-longkey")
    val schema = KvSchema.of("id", "v" -> ("f", "v"))
    KvTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1),
      path, schema, SinkMode.Replace)
    KvTable.write(Seq((100L, "c"), (200L, "d")).toDF("id", "v").coalesce(1),
      path, schema, SinkMode.Append)
    val df = spark.read.format("kvtable").load(path)
    assert(df.filter($"id" > 50L).rdd.getNumPartitions <
      df.rdd.getNumPartitions)
    assert(df.filter($"id" > 50L).select("v").as[String].collect().sorted ===
      Array("c", "d"))
  }
}
