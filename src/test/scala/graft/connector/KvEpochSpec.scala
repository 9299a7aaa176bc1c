package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable, SinkMode}

/** Exactly-once streaming commits: a replayed epoch (same queryId +
  * epochId — what the engine re-sends after a crash between a commit
  * and its checkpoint write) must not publish twice. Drives the
  * StreamingWrite surface directly so the replay is deterministic
  * (the real engine replays only after a crash). */
class KvEpochSpec extends SparkSpec {
  import spark.implicits._

  test("a replayed streaming epoch is skipped; new epochs and other " +
    "queries still commit") {
    val path = TestSpark.scratch("kv-epoch")
    val schema = KvSchema.of("k", "v" -> ("f", "v"))
    KvTable.write(Seq(("k1", "base")).toDF("k", "v"), path, schema,
      SinkMode.Replace)
    val rawType = KvTable.readRaw(spark, path).schema
    val conf = new Configuration()

    def epochWrite(sw: KvStreamingWrite, epoch: Long, value: String,
                   ver: Long): Unit = {
      val w = sw.createStreamingWriterFactory(null)
        .createWriter(0, epoch * 10, epoch)
      w.write(new GenericInternalRow(Array[Any](
        UTF8String.fromString("k1"), UTF8String.fromString(value),
        ver, 0L, false)))
      sw.commit(epoch, Array(w.commit()))
    }
    def live = KvTable.read(spark, path).filter($"k" === "k1")
      .select("v").as[String].head()
    def metaVer = KvV2Util.readMeta(path, conf)._1
    def fileCount = KvV2Util.dataFiles(path, conf).length

    val sw = new KvStreamingWrite(path, rawType, None, "query-A")
    epochWrite(sw, 1, "a", ver = 101L)
    assert(live === "a")
    val (verAfter1, filesAfter1) = (metaVer, fileCount)

    // replay of epoch 1: same query id -> publish skipped, replayed
    // task file deleted, version counter untouched
    epochWrite(sw, 1, "replayed", ver = 150L)
    assert(live === "a")
    assert(metaVer === verAfter1 && fileCount === filesAfter1)

    // the next epoch commits normally
    epochWrite(sw, 2, "c", ver = 102L)
    assert(live === "c")
    assert(metaVer === verAfter1 + 1)

    // an INDEPENDENT query reusing an epoch number is not deduped
    epochWrite(new KvStreamingWrite(path, rawType, None, "query-B"), 1, "d",
      ver = 300L)
    assert(live === "d")
  }
}
