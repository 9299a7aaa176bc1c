package graft.queries

import graft.SparkSpec
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Pins the optimization-round rewrite of [[SimQueries.refreshDriftSidecar]]:
  * per-cid counts now come from parquet FOOTER metadata instead of a
  * full-scan Spark job. Footer row counts are exact, so the sidecar it
  * writes must equal the full `groupBy(cid).count()` recount — over a
  * multi-file, multi-level (bid=/cid=) layout including an empty-ish
  * cid skew, exactly the shapes the append/ingest paths produce. */
class IvfSidecarSpec extends SparkSpec {

  private def sidecarLines(path: String, name: String): Map[Int, (Long, Long)] = {
    val f = java.nio.file.Paths.get(path, name)
    new String(java.nio.file.Files.readAllBytes(f)).split('\n')
      .filter(_.nonEmpty).map { l =>
        val a = l.split(':'); a(0).toInt -> (a(1).toLong, a(2).toLong)
      }.toMap
  }

  test("footer-derived sidecar equals the full-scan recount on a " +
      "bid=/cid= layout with multiple files per list") {
    val path = TestSpark.scratch("ivf_sidecar")
    new java.io.File(path).mkdirs()
    import spark.implicits._
    // two "batches" into bid= dirs, skewed cids, several files per dir
    val b0 = (0 until 500).map(i => (i.toLong, i % 7)).toDF("id", "cid")
    val b1 = (0 until 300).map(i => (i.toLong + 1000, i % 3)).toDF("id", "cid")
    b0.repartition(3).write.partitionBy("cid").parquet(s"$path/assigned_live/bid=0")
    b1.repartition(2).write.partitionBy("cid").parquet(s"$path/assigned_live/bid=1")

    SimQueries.refreshDriftSidecar(spark, path, "assigned_live",
      "listcounts_live.txt")

    val want = spark.read.parquet(s"$path/assigned_live")
      .groupBy(col("cid")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    val got = sidecarLines(path, "listcounts_live.txt")
    assert(got.keySet == want.keySet)
    want.foreach { case (cid, n) =>
      assert(got(cid) == ((0L, n)), s"cid=$cid")
    }
  }

  test("footer-derived sidecar honors durable base counts on a flat " +
      "cid= layout") {
    val path = TestSpark.scratch("ivf_sidecar_base")
    new java.io.File(path).mkdirs()
    import spark.implicits._
    val rows = (0 until 400).map(i => (i.toLong, i % 5)).toDF("id", "cid")
    rows.repartition(2).write.partitionBy("cid").parquet(s"$path/assigned")
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "basecounts.txt"),
      "0:11\n2:7".getBytes)

    SimQueries.refreshDriftSidecar(spark, path)

    val want = spark.read.parquet(s"$path/assigned")
      .groupBy(col("cid")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    val got = sidecarLines(path, "listcounts.txt")
    assert(got.keySet == want.keySet)
    want.foreach { case (cid, n) =>
      val base = Map(0 -> 11L, 2 -> 7L).getOrElse(cid, 0L)
      assert(got(cid) == ((base, n)), s"cid=$cid")
    }
  }
}
