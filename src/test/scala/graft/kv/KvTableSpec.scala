package graft.kv

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}
import graft.ops.Ops

/** Value-level parity tests for the KV table, reproducing the reference's
  * two E2E scenarios (SURVEY.md §5) but asserting cell values, not just
  * counts (stronger than the reference's count-only `verifySink`,
  * `HBaseTestCase.java:46-61`).
  */
class KvTableSpec extends SparkSpec {
  import spark.implicits._

  /** The reference fixture, verbatim (`src/test/data/small.txt:1-13`):
    * 13 space-delimited `num lower upper` lines, 5 distinct keys. */
  val smallTxt: Seq[String] = Seq(
    "1 a A", "1 b B", "1 c C", "2 b B", "2 c C", "2 d D", "3 c C",
    "4 b B", "4 c C", "4 d D", "5 a A", "5 b B", "5 e E")

  val schema: KvSchema = KvSchema.of("num",
    "lower" -> ("left", "lower"),
    "upper" -> ("right", "upper"))

  def parsed: DataFrame = {
    val lines = spark.createDataset(smallTxt).toDF("line").coalesce(1)
    Ops.regexSplitter("line", " ", Seq("num", "lower", "upper"))(lines)
  }

  test("file -> table upsert collapses 13 lines to 5 rows, last write wins") {
    val path = TestSpark.scratch("kv-upsert")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    val rows = KvTable.read(spark, path).orderBy("num")
      .as[(String, String, String)].collect()
    assert(rows.length === 5) // MultiFamilyHBaseTest.java:71
    // Last line per key in file order wins — HBase Put overwrite semantics.
    assert(rows === Array(
      ("1", "c", "C"), ("2", "d", "D"), ("3", "c", "C"),
      ("4", "d", "D"), ("5", "e", "E")))
  }

  test("round trip table -> table preserves values (fixes the reference's " +
    "byte[]-write ClassCastException asymmetry)") {
    val p1 = TestSpark.scratch("kv-rt1")
    val p2 = TestSpark.scratch("kv-rt2")
    KvTable.write(parsed, p1, schema, SinkMode.Replace)
    val readBack = KvTable.read(spark, p1)
    KvTable.write(readBack, p2, schema, SinkMode.Replace)
    val rows = KvTable.read(spark, p2).orderBy("num")
      .as[(String, String, String)].collect()
    assert(rows.length === 5) // MultiFamilyHBaseTest.java:84
    assert(rows.map(_._1) === Array("1", "2", "3", "4", "5"))
  }

  test("binary cell values round-trip byte-for-byte") {
    // The reference casts every sink value to String and would
    // ClassCastException on a byte[] write-back (HBaseScheme.java:120);
    // here BinaryType cells are first-class.
    val path = TestSpark.scratch("kv-binary")
    val s = KvSchema.of("k", "payload" -> ("f", "payload"))
    val data = Seq(("a", Array[Byte](0, 1, -1, 127)), ("b", Array[Byte]()))
      .toDF("k", "payload")
    KvTable.write(data, path, s, SinkMode.Replace)
    val back = KvTable.read(spark, path)
    KvTable.write(back, path + "-copy", s, SinkMode.Replace)
    val rows = KvTable.read(spark, path + "-copy").orderBy("k")
      .as[(String, Array[Byte])].collect()
    assert(rows.map(_._1) === Array("a", "b"))
    assert(rows(0)._2.toSeq === Seq[Byte](0, 1, -1, 127))
    assert(rows(1)._2.toSeq === Seq.empty)
  }

  test("APPEND accumulates distinct keys: 13 then 26 rows") {
    // MultiFamilyCascadeHBaseTest.java:89-104, with deterministic unique
    // keys instead of the reference's Math.random().
    val path = TestSpark.scratch("kv-append")
    val unique1 = parsed.withColumn("num",
      concat(lit("a-"), monotonically_increasing_id().cast("string")))
    val unique2 = parsed.withColumn("num",
      concat(lit("b-"), monotonically_increasing_id().cast("string")))
    KvTable.write(unique1, path, schema, SinkMode.Replace)
    assert(KvTable.read(spark, path).count() === 13)
    KvTable.write(unique2, path, schema, SinkMode.Append)
    assert(KvTable.read(spark, path).count() === 26)
  }

  test("newer version wins regardless of write order (versionFrom)") {
    val path = TestSpark.scratch("kv-version")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    val newer = Seq(("k1", "new", 10L)).toDF("k", "v", "ver")
    val older = Seq(("k1", "old", 5L)).toDF("k", "v", "ver")
    KvTable.write(newer, path, s, SinkMode.Replace, Some(col("ver")))
    KvTable.write(older, path, s, SinkMode.Append, Some(col("ver")))
    val rows = KvTable.read(spark, path).as[(String, String)].collect()
    assert(rows === Array(("k1", "new")))
  }

  test("readAsOf returns the exact snapshot before later upserts and deletes") {
    val path = TestSpark.scratch("kv-asof")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    KvTable.write(Seq(("a", "v1"), ("b", "v1"), ("c", "v1")).toDF("k", "v"),
      path, s, SinkMode.Replace)                       // batch 1
    KvTable.write(Seq(("b", "v2")).toDF("k", "v"), path, s) // batch 2
    KvTable.delete(Seq("c").toDF("k"), path, s)            // batch 3
    def view(asOf: Long) = KvTable.readAsOf(spark, path, asOf)
      .orderBy("k").as[(String, String)].collect()
    assert(view(1L) === Array(("a", "v1"), ("b", "v1"), ("c", "v1")))
    assert(view(2L) === Array(("a", "v1"), ("b", "v2"), ("c", "v1")))
    assert(view(3L) === Array(("a", "v1"), ("b", "v2"))) // == read()
    assert(KvTable.read(spark, path).orderBy("k")
      .as[(String, String)].collect() === view(3L))
  }

  test("readChanges replays the mutation stream after a version " +
    "checkpoint, deletes flagged") {
    val path = TestSpark.scratch("kv-changes")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    KvTable.write(Seq(("a", "v1"), ("b", "v1")).toDF("k", "v"),
      path, s, SinkMode.Replace)                         // version 1
    KvTable.write(Seq(("b", "v2")).toDF("k", "v"), path, s) // version 2
    KvTable.delete(Seq("a").toDF("k"), path, s)             // version 3
    def feed(after: Long) = KvTable.readChanges(spark, path, after)
      .select("k", "version", "is_delete")
      .as[(String, Long, Boolean)].collect()
    assert(feed(0L).toSet ===
      Set(("a", 1L, false), ("b", 1L, false), ("b", 2L, false),
        ("a", 3L, true)))
    // incremental poll from a checkpoint sees only newer mutations
    assert(feed(2L) === Array(("a", 3L, true)))
    assert(feed(3L).isEmpty)
  }

  test("readTtl expires old cells (rows vanish when their newest cell " +
    "is expired) and compact(expireBelow) makes it physical") {
    val path = TestSpark.scratch("kv-ttl")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    val batch1 = Seq(("a", "old", 10L), ("b", "old", 10L)).toDF("k", "v", "ver")
    val batch2 = Seq(("b", "new", 20L)).toDF("k", "v", "ver")
    KvTable.write(batch1, path, s, SinkMode.Replace, Some(col("ver")))
    KvTable.write(batch2, path, s, SinkMode.Append, Some(col("ver")))
    // cutoff 15: a's only cell expired -> row gone; b's newest survives
    def ttlView = KvTable.readTtl(spark, path, 15L)
      .orderBy("k").as[(String, String)].collect()
    assert(ttlView === Array(("b", "new")))
    // an expired tombstone stops masking nothing (delete below cutoff)
    KvTable.delete(Seq("b").toDF("k"), path, s, version = Some(12L))
    assert(ttlView === Array(("b", "new")))
    // physical expiry: compaction drops expired cells; plain read then
    // equals the TTL view, and the log holds only surviving cells
    KvTable.compact(spark, path, expireBelow = Some(15L))
    assert(KvTable.read(spark, path).orderBy("k")
      .as[(String, String)].collect() === Array(("b", "new")))
    assert(KvTable.readRaw(spark, path).count() === 1L)
  }

  test("tombstone delete removes a key; re-upsert resurrects it") {
    val path = TestSpark.scratch("kv-tomb")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    KvTable.delete(Seq("2").toDF("num"), path, schema)
    assert(KvTable.read(spark, path).orderBy("num")
      .select("num").as[String].collect() === Array("1", "3", "4", "5"))
    KvTable.write(parsed.filter($"num" === "2"), path, schema, SinkMode.Append)
    assert(KvTable.read(spark, path).count() === 5)
  }

  test("range scan is closed-open [lower, upper)") {
    val path = TestSpark.scratch("kv-range")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    val got = KvTable.readRange(spark, path, Some("2"), Some("4"))
      .select("num").as[String].collect().sorted
    assert(got === Array("2", "3")) // 4 excluded: fixes reference tail-split bug
  }

  test("Keep mode refuses to overwrite an existing table") {
    val path = TestSpark.scratch("kv-keep")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    intercept[IllegalStateException] {
      KvTable.write(parsed, path, schema, SinkMode.Keep)
    }
  }

  test("schema persists with the table and derives families") {
    val path = TestSpark.scratch("kv-schema")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    val loaded = KvTable.readSchema(spark, path)
    assert(loaded === schema)
    assert(loaded.families === Seq("left", "right")) // HBaseScheme.java:170-177
    // (family, qualifier) metadata survives onto read columns
    val md = KvTable.read(spark, path).schema("lower").metadata
    assert(md.getString(KvSchema.FamilyKey) === "left")
    assert(md.getString(KvSchema.QualifierKey) === "lower")
  }

  test("readVersions surfaces version history, newest first, " +
    "tombstone hides older versions") {
    val path = TestSpark.scratch("kv-versions")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    def put(k: String, v: String, ver: Long): Unit =
      KvTable.write(Seq((k, v, ver)).toDF("k", "v", "ver"), path,
        s, if (KvTable.exists(spark, path)) SinkMode.Append else SinkMode.Replace,
        Some(col("ver")))
    put("a", "v1", 1); put("a", "v2", 2); put("a", "v3", 3); put("b", "x", 1)
    val hist = KvTable.readVersions(spark, path, 2)
      .orderBy("k", "version_rank")
      .select("k", "v", "version_rank").as[(String, String, Int)].collect()
    assert(hist === Array(("a", "v3", 1), ("a", "v2", 2), ("b", "x", 1)))
    // delete at version 10 hides everything older; a later put resurrects
    KvTable.delete(Seq("a").toDF("k"), path, s, version = Some(10L))
    assert(KvTable.readVersions(spark, path, 5).filter($"k" === "a").count() === 0)
    put("a", "v4", 11)
    val after = KvTable.readVersions(spark, path, 5).filter($"k" === "a")
      .select("v").as[String].collect()
    assert(after === Array("v4"))
  }

  test("bucketed compaction: point lookups prune to one bucket; " +
    "appends stay bucket-aligned") {
    val path = TestSpark.scratch("kv-bucketed")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    KvTable.compactBucketed(spark, path, buckets = 4)
    assert(KvTable.numBuckets(spark, path) === 4)
    // LWW view unchanged by the layout rewrite
    assert(KvTable.read(spark, path).orderBy("num")
      .as[(String, String, String)].collect() === Array(
      ("1", "c", "C"), ("2", "d", "D"), ("3", "c", "C"),
      ("4", "d", "D"), ("5", "e", "E")))
    // point lookup returns exactly the key's row and prunes to the
    // key's bucket directory inside the V2 scan (bucketSetFor routing:
    // 1 planned partition, not one per bucket)
    val got = KvTable.get(spark, path, "2")
    assert(got.as[(String, String, String)].collect() === Array(("2", "d", "D")))
    val raw = spark.read.format("kvtable").load(path)
    assert(raw.filter($"num" === "2")
      .select("num", "lower", "upper").rdd.getNumPartitions === 1)
    // appends after bucketing keep working and stay visible
    KvTable.write(Seq(("2", "z", "Z")).toDF("num", "lower", "upper"),
      path, schema, SinkMode.Append)
    assert(KvTable.get(spark, path, "2").as[(String, String, String)]
      .collect() === Array(("2", "z", "Z")))
    assert(KvTable.read(spark, path).count() === 5)
  }

  test("compaction preserves versionFrom LWW ordering (no version reset)") {
    val path = TestSpark.scratch("kv-compact-ver")
    def putAt(row: (String, String, String), ts: Long): Unit =
      KvTable.write(Seq(row).toDF("num", "lower", "upper")
          .withColumn("ts", lit(ts)),
        path, schema, SinkMode.Append, versionFrom = Some(col("ts")))
    KvTable.drop(spark, path)
    putAt(("1", "a", "A"), 100L)
    KvTable.compact(spark, path)
    // an append carrying an OLDER event time must NOT win post-compaction
    putAt(("1", "b", "B"), 50L)
    assert(KvTable.read(spark, path).as[(String, String, String)]
      .collect() === Array(("1", "a", "A")))
    // a genuinely newer event time still wins
    putAt(("1", "c", "C"), 150L)
    assert(KvTable.read(spark, path).as[(String, String, String)]
      .collect() === Array(("1", "c", "C")))
    // same invariant through the bucketed compaction path
    KvTable.compactBucketed(spark, path, buckets = 2)
    putAt(("1", "d", "D"), 120L)
    assert(KvTable.read(spark, path).as[(String, String, String)]
      .collect() === Array(("1", "c", "C")))
  }

  test("compaction cleans a stale .data-old from a prior crash and " +
    "leaves no aside copy on success") {
    val path = TestSpark.scratch("kv-compact-crash")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // simulate a crash between rename-aside and cleanup
    val stale = new org.apache.hadoop.fs.Path(s"$path/.data-old")
    fs.mkdirs(stale)
    fs.create(new org.apache.hadoop.fs.Path(stale, "junk.parquet"), true).close()
    KvTable.compact(spark, path)
    assert(!fs.exists(stale), "stale .data-old not cleaned")
    assert(KvTable.read(spark, path).count() === 5)
  }

  test("a crash between swap renames self-heals on the next READ " +
    "(not only the next compaction)") {
    val path = TestSpark.scratch("kv-swap-crash-read")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // simulate the crash window exactly between the two renames:
    // data/ moved aside, replacement never published
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/data"),
      new org.apache.hadoop.fs.Path(s"$path/.data-old")))
    assert(KvTable.read(spark, path).count() === 5) // self-restores
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/data")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/.data-old")))
  }

  test("a delete with a regressed version cannot regress the meta " +
    "counter (later auto-versioned writes still win deterministically)") {
    val path = TestSpark.scratch("kv-ver-regress")
    KvTable.write(Seq(("1", "a", "A")).toDF("num", "lower", "upper"),
      path, schema, SinkMode.Replace) // batch version 1
    // tombstone explicitly versioned BELOW the live cells: a no-op for
    // LWW, and it must NOT pull the meta counter back to 0
    KvTable.delete(Seq("1").toDF("num"), path, schema, version = Some(0L))
    KvTable.write(Seq(("1", "b", "B")).toDF("num", "lower", "upper"),
      path, schema) // must get version 2, strictly above the live cell
    val rows = KvTable.readVersions(spark, path, 1)
      .select("num", "lower", "version").as[(String, String, Long)].collect()
    assert(rows === Array(("1", "b", 2L)))
  }

  test("minor compaction merges small files losslessly: raw log " +
    "identical, version history intact, large files untouched") {
    val path = TestSpark.scratch("kv-minor")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    // four appends -> >= 4 small files; one delete -> tombstones too
    (1 to 4).foreach { i =>
      KvTable.write(Seq((s"k${i % 2}", s"v$i")).toDF("k", "v"), path, s,
        if (i == 1) SinkMode.Replace else SinkMode.Append)
    }
    KvTable.delete(Seq("k0").toDF("k"), path, s)
    def rawRows = KvTable.readRaw(spark, path)
      .select("k", "v", KvTable.VersionCol, KvTable.SeqCol, KvTable.TombstoneCol)
      .collect().toSet
    def dataFiles = {
      val f = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      f.listStatus(new org.apache.hadoop.fs.Path(s"$path/data"))
        .filter(e => e.isFile && e.getPath.getName.endsWith(".parquet"))
    }
    val before = rawRows
    val nBefore = dataFiles.length
    assert(nBefore >= 5)
    // threshold below every file size: nothing qualifies, nothing merged
    assert(KvTable.compactMinor(spark, path, smallFileBytes = 1L) === 0)
    assert(dataFiles.length === nBefore)
    // real run: all small files merge into one; bytes are preserved
    assert(KvTable.compactMinor(spark, path) === 1)
    assert(dataFiles.length === 1)
    assert(rawRows === before)
    // LWW view and multi-version history unchanged
    assert(KvTable.read(spark, path).orderBy("k")
      .as[(String, String)].collect() === Array(("k1", "v3")))
    assert(KvTable.readVersions(spark, path, 10)
      .select("k", "v").as[(String, String)].collect().toSet ===
      Set(("k1", "v1"), ("k1", "v3")))
  }

  test("minor compaction on a bucketed table merges per bucket and " +
    "keeps region pruning") {
    val path = TestSpark.scratch("kv-minor-bucketed")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    KvTable.write((1 to 20).map(i => (s"k$i", s"v$i")).toDF("k", "v"),
      path, s, SinkMode.Replace)
    KvTable.compactBucketed(spark, path, buckets = 3)
    // two appends spread over every bucket -> small files per bucket dir
    KvTable.write((1 to 20).map(i => (s"k$i", s"u$i")).toDF("k", "v"), path, s)
    KvTable.write((1 to 20).map(i => (s"k$i", s"w$i")).toDF("k", "v"), path, s)
    val merged = KvTable.compactMinor(spark, path)
    assert(merged === 3, s"expected one merge per bucket, got $merged")
    assert(KvTable.numBuckets(spark, path) === 3)
    assert(KvTable.get(spark, path, "k7").as[(String, String)].collect() ===
      Array(("k7", "w7")))
    assert(KvTable.read(spark, path).count() === 20)
    // merged files must NOT carry a physical __bucket column (it is a
    // directory coordinate; an all-null physical copy would poison
    // bucket-predicate stats and manifest schema rebuilds)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val mergedFile = f.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/data/__bucket=0"))
      .filter(_.getPath.getName.startsWith("minor-")).head.getPath
    assert(!spark.read.parquet(mergedFile.toString)
      .schema.fieldNames.contains("__bucket"))
    // V2 read path stays green after the per-bucket merges
    assert(KvTable.readV2(spark, path).count() === 20)
  }

  test("compactMinor on an empty (created-but-never-written) table " +
    "is a no-op, not a crash") {
    val path = TestSpark.scratch("kv-minor-empty")
    val s = KvSchema.of("k", "v" -> ("f", "v"))
    // mimic catalog CREATE TABLE: schema + meta, no data dir
    new java.io.File(path).mkdirs()
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$path/_kvschema.json"), true)
    out.write(s.toJson.getBytes("UTF-8")); out.close()
    graft.connector.KvV2Util.writeMeta(path,
      spark.sparkContext.hadoopConfiguration, 0L, 0)
    assert(KvTable.compactMinor(spark, path) === 0)
  }

  test("compact preserves the LWW view") {
    val path = TestSpark.scratch("kv-compact")
    KvTable.write(parsed, path, schema, SinkMode.Replace)
    KvTable.delete(Seq("5").toDF("num"), path, schema)
    val before = KvTable.read(spark, path).orderBy("num")
      .as[(String, String, String)].collect()
    KvTable.compact(spark, path)
    val after = KvTable.read(spark, path).orderBy("num")
      .as[(String, String, String)].collect()
    assert(after === before)
    assert(KvTable.readRaw(spark, path).count() === before.length)
  }
}

class KvSchemaSpec extends SparkSpec {
  test("single-key invariant and name collisions rejected") {
    // HBaseScheme.java:151-155 analog
    intercept[IllegalArgumentException] {
      KvSchema.of("k", "k" -> ("f", "q"))
    }
    intercept[IllegalArgumentException] {
      KvSchema.of("k", "v" -> ("f", "q"), "v" -> ("g", "q"))
    }
    intercept[IllegalArgumentException] { KvSchema("k", Nil) }
    // engine-column collisions rejected (write() would silently clobber)
    intercept[IllegalArgumentException] {
      KvSchema.of("__version", "v" -> ("f", "q"))
    }
    intercept[IllegalArgumentException] {
      KvSchema.of("k", "__tombstone" -> ("f", "q"))
    }
  }

  test("json round trip") {
    val s = KvSchema.of("key",
      "a" -> ("fam1", "q1"), "b" -> ("fam1", "q2"), "c" -> ("fam2", "q1"))
    assert(KvSchema.fromJson(s.toJson) === s)
    assert(s.families === Seq("fam1", "fam2"))
    assert(s.fieldNames === Seq("key", "a", "b", "c"))
  }
}
