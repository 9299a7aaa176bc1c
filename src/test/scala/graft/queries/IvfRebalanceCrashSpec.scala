package graft.queries

import graft.{SparkSpec, TestSpark}
import graft.similarity.Similarity
import org.apache.spark.sql.functions.{broadcast, col}

/** Crash-injection proof that IVF list rebalancing is ATOMIC under the
  * ROUTING manifest: killed between any two stages of
  * [[SimQueries.rebalanceHotList]], serving still sees every vector
  * through EXACTLY one routed list (never zero, never two), and a
  * recovered run converges to the bit-identical post-split state an
  * uncrashed run produces. This is the failure mode the r9 verdict
  * named: the pre-manifest append-then-drop order could double-serve
  * the hot list's members if the process died between the sub-list
  * append and the hot-dir delete. */
class IvfRebalanceCrashSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private final class Injected extends RuntimeException("injected crash")

  private def crashAt(stage: String): String => Unit =
    at => if (at == stage) throw new Injected

  private def freshPath(tag: String): String = {
    val p = TestSpark.scratch(s"ivf_crash_$tag")
    new java.io.File(p).mkdirs()
    p
  }

  /** The ids serving can reach: assigned rows whose list the ROUTING
    * manifest references — the exact visibility rule of
    * ivfSearchAssigned (probes are drawn from the routed centroids, so
    * unrouted lists never match the probe join). */
  private def servedIds(path: String): Seq[Long] = {
    val routed = SimQueries.routedCentroids(spark, path).select(col("cid"))
    spark.read.parquet(s"$path/assigned")
      .join(broadcast(routed), Seq("cid"))
      .select(col("id")).collect().map(_.getLong(0)).toSeq
  }

  private def serve(path: String): Seq[(Long, Long, Long, Int)] = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.ivfSearchAssigned(spark.read.parquet(s"$path/assigned"),
        queries, SimQueries.routedCentroids(spark, path), nprobe = 4, k = 5)
      .orderBy(col("qid"), col("rank"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12), r.getInt(3)))
  }

  test("killed between sub-list staging and the routing swap: the " +
      "layout holds the hot members TWICE (hot dir + staged subs) but " +
      "serving sees each exactly once through the PRE-split routing; " +
      "a re-run recovers to the completed split") {
    val path = freshPath("staged")
    SimQueries.buildRebalanceBase(spark, dir, path)
    val before = servedIds(path)
    assert(before.distinct.size === before.size, "base build double-serves")

    intercept[Injected] {
      SimQueries.rebalanceHotList(spark, path, crashAt("staged"))
    }
    // the danger is REAL: the raw layout now duplicates the hot members
    val raw = spark.read.parquet(s"$path/assigned").count()
    assert(raw > before.size.toLong,
      "crash point did not leave staged duplicates — injection misplaced")
    // ...but the manifest keeps serving exact-once, unchanged
    val afterCrash = servedIds(path)
    assert(afterCrash.sorted === before.sorted,
      "mid-split crash changed or double-served the visible set")

    // recovery: the next maintenance run GCs the orphans and completes
    SimQueries.rebalanceHotList(spark, path)
    val recovered = servedIds(path)
    assert(recovered.sorted === before.sorted,
      "recovered split lost or duplicated vectors")
    val hot = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "rebalance.txt")).trim.toInt
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/assigned", s"cid=$hot")),
      "recovered run left the split hot dir on disk")
  }

  test("killed between the routing swap and GC: the stale hot dir is " +
      "still on disk but unrouted — serving sees the POST-split set " +
      "exactly once, bit-identical to an uncrashed rebalance") {
    val crashed = freshPath("published")
    SimQueries.buildRebalanceBase(spark, dir, crashed)
    val before = servedIds(crashed)
    intercept[Injected] {
      SimQueries.rebalanceHotList(spark, crashed, crashAt("published"))
    }
    val hot = java.nio.file.Files.readString(
      java.nio.file.Paths.get(crashed, "rebalance.txt")).trim.toInt
    assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$crashed/assigned", s"cid=$hot")),
      "crash point did not leave the stale hot dir — injection misplaced")
    val afterCrash = servedIds(crashed)
    assert(afterCrash.sorted === before.sorted,
      "post-swap crash changed or double-served the visible set")

    // an uncrashed twin build: the crashed index must SERVE identically
    // (same queries, same ranks, same cosines) even before its GC runs
    val clean = freshPath("clean")
    SimQueries.buildRebalanceBase(spark, dir, clean)
    SimQueries.rebalanceHotList(spark, clean)
    assert(serve(crashed) === serve(clean),
      "crashed-but-published index serves differently from a clean one")
  }

  test("killed after writing the post-split centroid set but before " +
      "the swap: still the pre-split view; recovery converges to the " +
      "clean result") {
    val path = freshPath("nextcents")
    SimQueries.buildRebalanceBase(spark, dir, path)
    val before = servedIds(path)
    intercept[Injected] {
      SimQueries.rebalanceHotList(spark, path, crashAt("next-cents-written"))
    }
    assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "ROUTING")).trim === "cents",
      "routing swapped before the crash point")
    assert(servedIds(path).sorted === before.sorted,
      "pre-swap crash changed the visible set")
    SimQueries.rebalanceHotList(spark, path)
    val clean = freshPath("clean2")
    SimQueries.buildRebalanceBase(spark, dir, clean)
    SimQueries.rebalanceHotList(spark, clean)
    assert(serve(path) === serve(clean),
      "recovered index serves differently from a clean one")
  }

  test("rebalance is NOT one-shot: a second split on a published index " +
      "targets the next manifest generation (never the dir it reads), " +
      "keeps serving exact-once, and a crash during it still recovers") {
    val path = freshPath("twice")
    SimQueries.buildRebalanceBase(spark, dir, path)
    val before = servedIds(path)

    // first split publishes generation 1
    SimQueries.rebalanceHotList(spark, path)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "ROUTING")).trim === "cents_g1")

    // the r10-ADVICE failure mode: a SECOND split on the published
    // index. With a fixed target dir this threw "Cannot overwrite a
    // path that is also being read from" after orphan sub-lists were
    // already staged; generational targets make it just work.
    SimQueries.rebalanceHotList(spark, path)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "ROUTING")).trim === "cents_g2")
    val afterTwo = servedIds(path)
    assert(afterTwo.sorted === before.sorted,
      "second split lost or duplicated vectors")

    // and a crash DURING a third split (post-staging) still holds the
    // exact-once contract and recovers to the clean three-split state
    intercept[Injected] {
      SimQueries.rebalanceHotList(spark, path, crashAt("staged"))
    }
    assert(servedIds(path).sorted === before.sorted,
      "crash during third split changed the visible set")
    SimQueries.rebalanceHotList(spark, path)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "ROUTING")).trim === "cents_g3")
    assert(servedIds(path).sorted === before.sorted,
      "recovered third split lost or duplicated vectors")

    val clean = freshPath("twiceclean")
    SimQueries.buildRebalanceBase(spark, dir, clean)
    SimQueries.rebalanceHotList(spark, clean)
    SimQueries.rebalanceHotList(spark, clean)
    SimQueries.rebalanceHotList(spark, clean)
    assert(serve(path) === serve(clean),
      "crash-recovered triple split serves differently from a clean one")
  }
}
