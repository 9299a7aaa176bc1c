package graft.queries

import graft.{SparkSpec, TestSpark}
import graft.similarity.Similarity
import org.apache.spark.sql.functions.col

/** Crash-injection proof for the APPEND maintenance paths — the r10
  * verdict's follow-up to IvfRebalanceCrashSpec: `ann_ivf_appended`
  * and `ann_ivf_stream_ingest` append into routed cid dirs plus a
  * drift sidecar, and a crash between the data commit and the sidecar
  * update must not lose serving exactness NOR leave the sidecar
  * silently disagreeing with the layout after recovery. The sidecar
  * is DERIVED state (recounted from the layout + durable base
  * counts), so recovery is a refresh, never a replay; the streaming
  * path additionally gets exactly-once across a checkpointed restart
  * from its idempotent per-batch bid-partition overwrite. */
class IvfIngestCrashSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private final class Injected extends RuntimeException("injected crash")

  private def freshPath(tag: String): String = {
    val p = TestSpark.scratch(s"ivf_ingest_$tag")
    new java.io.File(p).mkdirs()
    p
  }

  /** Serve top-5 for the first 10 query vectors over the given
    * assignment dir with the index's own centroids — the consumer's
    * view the crash must never corrupt. */
  private def serve(path: String, sub: String): Seq[(Long, Long, Long, Int)] = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.ivfSearchAssigned(spark.read.parquet(s"$path/$sub"),
        queries, spark.read.parquet(s"$path/cents"), nprobe = 4, k = 5)
      .orderBy(col("qid"), col("rank"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12), r.getInt(3)))
  }

  private def readSidecar(path: String, name: String): Seq[(Int, Long, Long)] =
    java.nio.file.Files.readString(java.nio.file.Paths.get(path, name))
      .split('\n').filter(_.nonEmpty).toSeq
      .map { l => val a = l.split(':'); (a(0).toInt, a(1).toLong, a(2).toLong) }

  private def layoutCounts(path: String, sub: String): Map[Int, Long] =
    spark.read.parquet(s"$path/$sub").groupBy(col("cid")).count()
      .collect().map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap

  test("batch append: killed between the data commit and the sidecar " +
      "update, the layout serves the batch exactly once but the drift " +
      "sidecar is stale — and the refresh recovery reconciles it to " +
      "the uncrashed run's sidecar, byte-identical") {
    val path = freshPath("append")
    SimQueries.buildAppendBase(spark, dir, path)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()

    intercept[Injected] {
      SimQueries.appendBatch(spark, path, SimQueries.ivfAppendBatch(spark, dir),
        at => if (at == "append-committed") throw new Injected)
    }
    // the data IS committed: base + batch, every id exactly once
    val assigned = spark.read.parquet(s"$path/assigned")
    assert(assigned.count() === n + (n + 9) / 10,
      "append data did not commit before the crash point")
    assert(assigned.select(col("id")).distinct().count() === assigned.count(),
      "crash left duplicate ids in the layout")
    // ...and the appended near-copies of the query vectors are SERVED
    // (rank rows reference ids >= the append stride), exactly once
    val served = serve(path, "assigned")
    assert(served.map(t => (t._1, t._2)).distinct.size === served.size,
      "a (qid, id) pair served twice")
    assert(served.exists(_._2 >= n),
      "no appended vector surfaced in the served top-k — the batch is " +
        "invisible, witness construction broken")
    // ...but the sidecar is missing or stale: the silent
    // under-trigger of rebalancing the crash creates
    val sidecarF = java.nio.file.Paths.get(path, "listcounts.txt")
    val stale = !java.nio.file.Files.exists(sidecarF) ||
      readSidecar(path, "listcounts.txt").map(_._3).sum != assigned.count()
    assert(stale, "sidecar already agrees — injection misplaced")

    // recovery: refresh derives the sidecar from durable state only
    SimQueries.refreshDriftSidecar(spark, path)
    val rows = readSidecar(path, "listcounts.txt")
    val layout = layoutCounts(path, "assigned")
    assert(rows.map(r => r._1 -> r._3).toMap === layout,
      "recovered sidecar 'after' counts disagree with the layout")
    assert(rows.map(_._2).sum === n, "base counts lost in recovery")
    assert(rows.forall { case (_, b, a) => a >= b },
      "recovery shows a list shrinking under append")

    // byte-identical to an uncrashed twin's sidecar, and same serving
    val clean = freshPath("appendclean")
    SimQueries.buildAppendBase(spark, dir, clean)
    SimQueries.appendBatch(spark, clean, SimQueries.ivfAppendBatch(spark, dir))
    assert(java.nio.file.Files.readString(sidecarF) ===
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(clean, "listcounts.txt")),
      "recovered sidecar differs from a clean run's")
    assert(served === serve(clean, "assigned"),
      "crashed-then-recovered index serves differently from a clean one")
  }

  test("streaming ingest: a batch killed after its data commit is " +
      "REPLAYED on the checkpointed restart without duplicating (the " +
      "bid-partition overwrite is idempotent), the sidecar reconciles " +
      "to the layout, and final serving matches an uncrashed ingest") {
    val path = freshPath("stream")
    SimQueries.buildStreamSrc(spark, dir, path)
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val ckpt = s"$path/ckpt"
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()

    // kill the SECOND micro-batch after its parquet commit but before
    // the sidecar refresh (and before the checkpoint marks it done)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      SimQueries.ingestStream(spark, path, schema, Some(ckpt),
        bid => if (bid == 1) throw new Injected)
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .take(10).exists(_.isInstanceOf[Injected]),
      s"stream died of something other than the injection: $ex")
    val mid = spark.read.parquet(s"$path/assigned_live")
    assert(mid.count() > 0 && mid.count() < n,
      "crash point did not stop the ingest mid-stream")
    assert(mid.select(col("id")).distinct().count() === mid.count(),
      "mid-crash layout holds duplicate ids")
    // sidecar covers only the batches whose refresh ran — stale by
    // construction (batch 1's data committed without it)
    assert(readSidecar(path, "listcounts_live.txt").map(_._3).sum
        < mid.count(),
      "sidecar already covers the crashed batch — injection misplaced")

    // restart from the SAME checkpoint: batch 1 replays (idempotent
    // overwrite of bid=1), batch 2 runs, sidecar heals
    SimQueries.ingestStream(spark, path, schema, Some(ckpt))
    val fin = spark.read.parquet(s"$path/assigned_live")
    assert(fin.count() === n, "restart lost rows or the replay duplicated")
    assert(fin.select(col("id")).distinct().count() === n,
      "replayed batch duplicated ids — the overwrite is not idempotent")
    assert(readSidecar(path, "listcounts_live.txt")
        .map(r => r._1 -> r._3).toMap === layoutCounts(path, "assigned_live"),
      "post-recovery sidecar disagrees with the layout")

    // an uncrashed twin must serve identically
    val clean = freshPath("streamclean")
    SimQueries.buildStreamSrc(spark, dir, clean)
    SimQueries.ingestStream(spark, clean, schema)
    assert(serve(path, "assigned_live") === serve(clean, "assigned_live"),
      "crash-recovered stream index serves differently from a clean one")
  }
}
