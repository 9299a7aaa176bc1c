package graft.kv

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

/** Bulk load (HBase completebulkload) and conditional mutation
  * (checkAndPut) semantics. */
class KvBulkLoadSpec extends SparkSpec {
  import spark.implicits._

  test("bulkLoad creates a bucket-compacted table in one job: one sorted " +
    "file per bucket, point gets prune to one bucket, read equals input") {
    val path = TestSpark.scratch("kvbulk")
    val schema = KvSchema.of("k", "v" -> ("f", "v"))
    val in = (0 until 200).map(i => (f"k$i%03d", s"v$i")).toDF("k", "v")
      .repartition(8) // rows span many input partitions on purpose
    KvTable.bulkLoad(in, path, schema, buckets = 4)

    assert(KvTable.numBuckets(spark, path) === 4)
    // one file per bucket directory (the declared clustered distribution)
    val dataDir = new java.io.File(s"$path/data")
    val bucketDirs = dataDir.listFiles().filter(_.getName.startsWith("__bucket="))
    assert(bucketDirs.length === 4)
    bucketDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1)
    }

    // round trip
    val back = KvTable.readV2(spark, path).orderBy("k")
      .as[(String, String)].collect()
    assert(back === (0 until 200).map(i => (f"k$i%03d", s"v$i")).sortBy(_._1))

    // a point get plans a single bucket's partitions
    val probe = spark.read.format("kvtable").load(path).filter($"k" === "k007")
    assert(probe.rdd.getNumPartitions === 1)
    assert(KvTable.get(spark, path, "k007").as[(String, String)].collect()
      === Array(("k007", "v7")))

    // the bulk-loaded table accepts normal appends afterwards
    KvTable.write(Seq(("k007", "UPDATED")).toDF("k", "v"), path, schema)
    assert(KvTable.get(spark, path, "k007").as[(String, String)].collect()
      === Array(("k007", "UPDATED")))

    // Keep mode refuses to clobber; Replace rebuilds
    intercept[IllegalArgumentException] {
      KvTable.bulkLoad(in, path, schema, buckets = 4)
    }
    KvTable.bulkLoad(in.limit(10), path, schema, buckets = 2, SinkMode.Replace)
    assert(KvTable.readV2(spark, path).count() === 10)
    assert(KvTable.numBuckets(spark, path) === 2)
  }

  test("checkAndPut applies only rows whose expectation matches the " +
    "current value; null expectation means if-absent") {
    val path = TestSpark.scratch("kvcas")
    val schema = KvSchema.of("k", "v" -> ("f", "v"), "n" -> ("f", "n"))
    KvTable.write(Seq(("a", "x", 1L), ("b", "y", 2L)).toDF("k", "v", "n"),
      path, schema, SinkMode.Replace)

    // a: correct expectation ("x") -> applied; b: stale ("wrong") -> not
    val up1 = Seq(("a", "x2", 10L, "x"), ("b", "y2", 20L, "wrong"))
      .toDF("k", "v", "n", "exp")
    assert(KvTable.checkAndPut(up1, path, schema, "v", col("exp")) === 1)
    assert(KvTable.read(spark, path).orderBy("k")
      .as[(String, String, Long)].collect()
      === Array(("a", "x2", 10L), ("b", "y", 2L)))

    // if-absent: c is new -> applied; a exists -> rejected
    val up2 = Seq(("c", "z", 30L), ("a", "nope", 0L)).toDF("k", "v", "n")
    assert(KvTable.checkAndPut(up2, path, schema, "v", lit(null)) === 1)
    assert(KvTable.read(spark, path).orderBy("k")
      .as[(String, String, Long)].collect()
      === Array(("a", "x2", 10L), ("b", "y", 2L), ("c", "z", 30L)))

    // CAS loop shape: re-running the same batch now finds "a" at "x2",
    // so the stale "x" expectation applies zero rows
    assert(KvTable.checkAndPut(up1, path, schema, "v", col("exp")) === 0)

    // deleted keys count as absent for the if-absent form
    KvTable.delete(Seq("b").toDF("k"), path, schema)
    assert(KvTable.checkAndPut(Seq(("b", "fresh", 9L)).toDF("k", "v", "n"),
      path, schema, "v", lit(null)) === 1)
    assert(KvTable.read(spark, path).filter($"k" === "b")
      .as[(String, String, Long)].collect() === Array(("b", "fresh", 9L)))
  }
}
