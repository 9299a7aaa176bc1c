package graft.connector

import org.apache.hadoop.fs.Path

import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable, SinkMode}

/** Split locality (SURVEY §2 row 3): block hosts from the filesystem
  * must reach Spark's scheduler as each split's `preferredLocations`,
  * the way the reference feeds region locations into its splits
  * (reference `TableInputFormatWrap.java:74-78`,
  * `TableSplitWrap.java:7-17`). A real HDFS isn't available offline, so
  * [[StubLocFileSystem]] re-reads a locally-written table through the
  * `stubloc://` scheme and reports deterministic fake datanode hosts.
  */
class KvLocalitySpec extends SparkSpec {
  import spark.implicits._

  private def writeTable(): String = {
    val path = TestSpark.scratch("locality-table")
    val schema = KvSchema.of("k", "v" -> ("f", "v"))
    val df = (1 to 100).map(i => (f"k$i%03d", s"v$i")).toDF("k", "v")
    KvTable.write(df.repartition(2), path, schema, SinkMode.Replace)
    path
  }

  test("block hosts surface as preferredLocations on every planned split " +
    "and reach the scheduler through the V2 scan RDD") {
    val stubPath = "stubloc:" + writeTable()
    val df = spark.read.format("kvtable").load(stubPath)

    // Builder level: every planned row-group split carries exactly the
    // hosts the filesystem reported for its file.
    val b = new KvScanBuilder(stubPath, df.schema)
    val parts = b.build().asInstanceOf[KvScan].planInputPartitions()
    assert(parts.nonEmpty)
    parts.foreach { p =>
      val kp = p.asInstanceOf[KvInputPartition]
      val expected = StubLocFileSystem.hostsFor(new Path(kp.file))
      assert(kp.preferredLocations().toSeq === expected.toSeq,
        s"split for ${kp.file} lost its block hosts")
    }
    // Distinct files on this layout land on more than one fake host —
    // locality that actually spreads, not a constant.
    val allHosts = parts.flatMap(_.preferredLocations()).toSet
    assert(allHosts.subsetOf(StubLocFileSystem.pool.toSet))

    // Scheduler level: the leaf scan RDD in the executed plan's lineage
    // reports the same hosts (DAGScheduler walks narrow deps to the
    // leaf itself; the top MapPartitions/codegen RDD legitimately
    // reports none of its own).
    def lineage(r: org.apache.spark.rdd.RDD[_]): Seq[org.apache.spark.rdd.RDD[_]] =
      r +: r.dependencies.flatMap(d => lineage(d.rdd))
    val schedHosts = lineage(df.queryExecution.toRdd)
      .flatMap(r => r.partitions.flatMap(sp => r.preferredLocations(sp)))
      .toSet
    assert(schedHosts.nonEmpty)
    assert(schedHosts.subsetOf(StubLocFileSystem.pool.toSet),
      s"scheduler saw $schedHosts")

    // And the stub scheme is a faithful read path: data is intact.
    assert(df.count() === 100)

    // Local-FS reads (the localhost degenerate case) must NOT pin tasks
    // to "localhost" — that would defeat executor spread on a cluster.
    val localDf = spark.read.format("kvtable")
      .load(stubPath.stripPrefix("stubloc:"))
    val lb = new KvScanBuilder(stubPath.stripPrefix("stubloc:"), localDf.schema)
    val localParts = lb.build().asInstanceOf[KvScan].planInputPartitions()
    assert(localParts.nonEmpty)
    localParts.foreach { p =>
      assert(!p.preferredLocations().contains("localhost"))
    }
  }
}
