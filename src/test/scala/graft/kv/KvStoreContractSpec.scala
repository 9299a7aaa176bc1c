package graft.kv

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, TestSpark}

/** Backend-independent contract for [[KvStore]] implementations: every
  * test here states a semantic the engine's operators assume of the
  * transport (LWW, tombstones, range bounds, sink modes, monotone
  * versions, DDL lifecycle) — the behaviors the reference gets from the
  * HBase client (`HBaseTap.java:69-150`, `TableOutputFormatWrap.java:66-69`).
  * A live HBase backend binds by implementing [[KvStore]] and extending
  * this class with its own `store` and `tableFor`; the suite is the
  * definition of "compatible".
  */
abstract class KvStoreContract extends SparkSpec {

  /** The backend under test. */
  def store: KvStore

  /** A fresh, unique table identifier in the backend's namespace. */
  def tableFor(test: String): String

  private val schema = KvSchema("k", Seq(KvField("v", "f", "val")))
  private val types = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private def rows(kv: (String, Long)*) = {
    import TestSpark.spark.implicits._
    kv.toSeq.toDF("k", "v")
  }
  private def asMap(t: String): Map[String, Long] =
    store.scan(spark, t).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("DDL lifecycle: create-if-missing, exists, drop, drop-again no-op") {
    val t = tableFor("ddl")
    assert(!store.exists(spark, t))
    store.create(spark, t, schema, types)
    assert(store.exists(spark, t))
    // created empty AND immediately scannable with the declared columns
    val empty = store.scan(spark, t)
    assert(empty.columns.toSeq === Seq("k", "v"))
    assert(empty.count() === 0)
    store.create(spark, t, schema, types) // if-missing: no-op, no error
    store.drop(spark, t)
    assert(!store.exists(spark, t))
    store.drop(spark, t) // delete-if-exists: no-op (HBaseTap.java:135)
  }

  test("write then scan returns the live view; LWW overwrites per key") {
    val t = tableFor("lww")
    store.write(rows("a" -> 1L, "b" -> 2L), t, schema)
    assert(asMap(t) === Map("a" -> 1L, "b" -> 2L))
    store.write(rows("b" -> 20L, "c" -> 3L), t, schema)
    assert(asMap(t) === Map("a" -> 1L, "b" -> 20L, "c" -> 3L))
    store.drop(spark, t)
  }

  test("delete tombstones dominate older cells; later writes resurrect") {
    val t = tableFor("tomb")
    store.write(rows("a" -> 1L, "b" -> 2L), t, schema)
    store.delete(rows("a" -> 0L).select(col("k")), t, schema)
    assert(asMap(t) === Map("b" -> 2L))
    store.write(rows("a" -> 9L), t, schema)
    assert(asMap(t) === Map("a" -> 9L, "b" -> 2L))
    store.drop(spark, t)
  }

  test("scanRange is start-inclusive, stop-exclusive, bounds optional") {
    val t = tableFor("range")
    store.write(rows("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L), t, schema)
    def keys(lo: Option[Any], hi: Option[Any]) =
      store.scanRange(spark, t, lo, hi).collect().map(_.getString(0)).toSet
    assert(keys(Some("b"), Some("d")) === Set("b", "c"))
    assert(keys(None, Some("b")) === Set("a"))
    assert(keys(Some("c"), None) === Set("c", "d"))
    assert(keys(None, None) === Set("a", "b", "c", "d"))
    store.drop(spark, t)
  }

  test("get is a 0-or-1-row point read") {
    val t = tableFor("get")
    store.write(rows("a" -> 1L, "b" -> 2L), t, schema)
    val hit = store.get(spark, t, "b").collect()
    assert(hit.length === 1 && hit.head.getLong(1) === 2L)
    assert(store.get(spark, t, "zzz").count() === 0)
    store.drop(spark, t)
  }

  test("sink modes: Keep refuses existing, Replace truncates, Append adds") {
    val t = tableFor("modes")
    store.write(rows("a" -> 1L), t, schema, SinkMode.Keep)
    intercept[IllegalStateException] {
      store.write(rows("x" -> 9L), t, schema, SinkMode.Keep)
    }
    store.write(rows("b" -> 2L), t, schema, SinkMode.Append)
    assert(asMap(t) === Map("a" -> 1L, "b" -> 2L))
    store.write(rows("z" -> 26L), t, schema, SinkMode.Replace)
    assert(asMap(t) === Map("z" -> 26L))
    store.drop(spark, t)
  }

  test("maxVersion is monotone non-decreasing across mutations") {
    val t = tableFor("ver")
    store.write(rows("a" -> 1L), t, schema)
    val v1 = store.maxVersion(spark, t)
    store.write(rows("a" -> 2L), t, schema)
    val v2 = store.maxVersion(spark, t)
    store.delete(rows("a" -> 0L).select(col("k")), t, schema)
    val v3 = store.maxVersion(spark, t)
    assert(v1 <= v2 && v2 <= v3, s"versions regressed: $v1, $v2, $v3")
    assert(v1 < v2, "a second write must allocate a NEWER version than the first")
    store.drop(spark, t)
  }
}

/** The parquet backend satisfies its own SPI contract. */
class ParquetKvStoreContractSpec extends KvStoreContract {
  def store: KvStore = ParquetKvStore
  def tableFor(test: String): String = TestSpark.scratch(s"kvstore-$test")
}
