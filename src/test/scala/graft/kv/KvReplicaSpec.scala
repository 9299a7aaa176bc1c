package graft.kv

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

/** CDC replication: a replica maintained by [[KvReplica.sync]] polls
  * must converge to the source's LWW view under appends, upserts,
  * deletes, same-version ties, and redundant/no-op syncs.
  */
class KvReplicaSpec extends SparkSpec {
  import spark.implicits._

  private val schema: KvSchema =
    KvSchema.of("k", "v" -> ("f", "v"), "n" -> ("f", "n"))

  private def df(rows: (String, String, Long)*): DataFrame =
    spark.createDataset(rows).toDF("k", "v", "n")

  private def view(path: String): Set[(String, String, Long)] =
    KvTable.read(spark, path).orderBy("k")
      .as[(String, String, Long)].collect().toSet

  test("initial sync copies the whole log; incremental sync ships only " +
    "new mutations and converges to the source view") {
    val src = TestSpark.scratch("repl-src")
    val dst = TestSpark.scratch("repl-dst")
    KvTable.write(df(("a", "x", 1L), ("b", "y", 2L)), src, schema,
      SinkMode.Replace)
    val ck1 = KvReplica.sync(spark, src, dst)
    assert(view(dst) === view(src))
    assert(KvReplica.checkpoint(spark, dst) === ck1)

    // upsert + new key + delete, then one poll
    KvTable.write(df(("a", "x2", 11L), ("c", "z", 3L)), src, schema)
    KvTable.delete(Seq("b").toDF("k"), src, schema)
    val ck2 = KvReplica.sync(spark, src, dst)
    assert(ck2 > ck1)
    assert(view(dst) === view(src))
    assert(view(dst) === Set(("a", "x2", 11L), ("c", "z", 3L)))
  }

  test("sync is idempotent: a poll with nothing new writes nothing and " +
    "keeps the checkpoint") {
    val src = TestSpark.scratch("repl-idem-src")
    val dst = TestSpark.scratch("repl-idem-dst")
    KvTable.write(df(("a", "x", 1L)), src, schema, SinkMode.Replace)
    val ck1 = KvReplica.sync(spark, src, dst)
    val filesBefore = graft.connector.KvV2Util.dataFiles(dst,
      spark.sparkContext.hadoopConfiguration).size
    val ck2 = KvReplica.sync(spark, src, dst)
    assert(ck2 === ck1)
    assert(graft.connector.KvV2Util.dataFiles(dst,
      spark.sparkContext.hadoopConfiguration).size === filesBefore)
    assert(view(dst) === view(src))
  }

  test("replicated same-version ties resolve exactly as the source's " +
    "(seq preserved), and event-time versions survive replication") {
    val src = TestSpark.scratch("repl-tie-src")
    val dst = TestSpark.scratch("repl-tie-dst")
    // one batch where key "a" appears twice with the SAME event-time
    // version: the source's intra-batch seq decides; the replica must
    // agree because (version, seq) ship verbatim
    val batch = Seq(("a", "first", 7L), ("a", "second", 7L))
      .toDF("k", "v", "n").coalesce(1)
    KvTable.write(batch, src, schema, SinkMode.Replace,
      versionFrom = Some(col("n") * 1000))
    KvReplica.sync(spark, src, dst)
    assert(view(dst) === view(src))
    // a later event-time write to the SOURCE still wins on the replica
    KvTable.write(df(("a", "third", 8L)), src, schema,
      versionFrom = Some(col("n") * 1000))
    KvReplica.sync(spark, src, dst)
    assert(view(dst) === Set(("a", "third", 8L)))
    // ...and a DIRECT write to the replica with the auto counter is not
    // shadowed by replicated event-time versions: counterTo advanced the
    // replica's counter past them
    KvTable.write(df(("a", "local", 9L)), dst, schema)
    assert(view(dst) === Set(("a", "local", 9L)))
  }

  test("replica refuses to sync from a different source than recorded") {
    val src = TestSpark.scratch("repl-guard-src")
    val other = TestSpark.scratch("repl-guard-other")
    val dst = TestSpark.scratch("repl-guard-dst")
    KvTable.write(df(("a", "x", 1L)), src, schema, SinkMode.Replace)
    KvTable.write(df(("b", "y", 2L)), other, schema, SinkMode.Replace)
    KvReplica.sync(spark, src, dst)
    intercept[IllegalArgumentException] {
      KvReplica.sync(spark, other, dst)
    }
  }
}
