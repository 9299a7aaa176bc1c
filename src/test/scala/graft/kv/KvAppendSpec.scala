package graft.kv

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

/** HBase-Append (cell-value concatenation) semantics over the log. */
class KvAppendSpec extends SparkSpec {
  import spark.implicits._

  private def readMap(path: String): Map[String, String] =
    KvAppend.read(spark, path).as[(String, String)].collect().toMap

  test("fragments concatenate in write order; delete restarts; compact " +
    "preserves the view and collapses to one cell per key") {
    val path = TestSpark.scratch("kvapp")
    KvAppend.appendTo(Seq(("a", "foo"), ("b", "x")).toDF("k", "piece"),
      path, "k", SinkMode.Replace)
    KvAppend.appendTo(Seq(("a", "-bar"), ("b", "y")).toDF("k", "piece"),
      path, "k")
    assert(readMap(path) === Map("a" -> "foo-bar", "b" -> "xy"))

    KvAppend.delete(Seq("b").toDF("k"), path)
    KvAppend.appendTo(Seq(("b", "fresh"), ("a", "!")).toDF("k", "piece"),
      path, "k")
    assert(readMap(path) === Map("a" -> "foo-bar!", "b" -> "fresh"))

    KvAppend.compact(spark, path)
    assert(readMap(path) === Map("a" -> "foo-bar!", "b" -> "fresh"))
    assert(KvTable.readRaw(spark, path).count() === 2)

    // post-compaction appends keep concatenating onto the joined cell
    KvAppend.appendTo(Seq(("b", "er")).toDF("k", "piece"), path, "k")
    assert(readMap(path) === Map("a" -> "foo-bar!", "b" -> "fresher"))
  }

  test("event-time versions order fragments, not arrival order") {
    val path = TestSpark.scratch("kvapp")
    // arrive out of order; versions say 1 then 2
    KvAppend.appendTo(Seq(("a", "world", 2L)).toDF("k", "piece", "et"),
      path, "k", SinkMode.Replace, versionFrom = Some(col("et")))
    KvAppend.appendTo(Seq(("a", "hello ", 1L)).toDF("k", "piece", "et"),
      path, "k", versionFrom = Some(col("et")))
    assert(readMap(path) === Map("a" -> "hello world"))
  }
}
