package graft.kv

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** A second, storage-independent [[KvStore]] backend: a driver-side cell
  * store with the HBase client's data model — per-(rowkey) version lists,
  * tombstone deletes, last-write-wins reads, monotone cell-timestamp
  * allocation. It exists to prove the SPI seam is real: the same
  * [[KvStoreContract]] suite that defines "compatible" for the parquet
  * backend passes unchanged against a backend that shares none of its
  * storage machinery (no files, no row groups, no V2 connector).
  *
  * This is a TEST DOUBLE for contract verification, deliberately shaped
  * like the transport a live binding wraps: `scan` materializes the live
  * view the way a client scanner iterates it (`HBaseTap.java:107-113`),
  * `write` applies a batch of mutations the way a buffered table writer
  * flushes them (`TableOutputFormatWrap.java:66-69`). A real cluster
  * backend would issue these per partition from executors; here the
  * batch is collected and applied driver-side, which is exactly wrong
  * for 100 TB and exactly right for proving semantics.
  */
class InMemoryKvStore extends KvStore {

  private final class Cell(val version: Long, val seq: Long,
                           val tombstone: Boolean, val values: Seq[Any])

  private final class TableState(var types: StructType) {
    val cells = mutable.Map.empty[Any, mutable.ArrayBuffer[Cell]]
    /** Newest cell timestamp ever seen — the allocation floor, so a new
      * batch always dominates live cells even after event-time writes. */
    var maxSeen = 0L
  }

  private val tables = new ConcurrentHashMap[String, TableState]()

  def exists(spark: SparkSession, table: String): Boolean =
    tables.containsKey(table)

  def create(spark: SparkSession, table: String, schema: KvSchema,
             types: StructType): Unit =
    tables.putIfAbsent(table, new TableState(types))

  def drop(spark: SparkSession, table: String): Unit =
    tables.remove(table)

  private def state(table: String): TableState = {
    val s = tables.get(table)
    require(s != null, s"no such table: $table")
    s
  }

  /** Live LWW view: per key the (version, seq)-max cell wins; tombstone
    * winners are absent. Rows come out rowkey-sorted like a scanner. */
  private def liveRows(s: TableState): Seq[Row] = s.synchronized {
    s.cells.toSeq
      .flatMap { case (k, versions) =>
        val newest = versions.maxBy(c => (c.version, c.seq))
        if (newest.tombstone) None else Some(k -> newest.values)
      }
      .sortBy(_._1.toString)
      .map { case (k, vs) => Row.fromSeq(k +: vs) }
  }

  def scan(spark: SparkSession, table: String): DataFrame = {
    val s = state(table)
    spark.createDataFrame(liveRows(s).asJava, s.types)
  }

  def scanRange(spark: SparkSession, table: String,
                start: Option[Any], stop: Option[Any]): DataFrame = {
    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    val s = state(table)
    val rows = liveRows(s).filter { r =>
      val k = r.get(0)
      start.forall(lo => cmp(k, lo) >= 0) && stop.forall(hi => cmp(k, hi) < 0)
    }
    spark.createDataFrame(rows.asJava, s.types)
  }

  def get(spark: SparkSession, table: String, key: Any): DataFrame = {
    val s = state(table)
    spark.createDataFrame(liveRows(s).filter(_.get(0) == key).asJava, s.types)
  }

  def write(df: DataFrame, table: String, schema: KvSchema,
            mode: SinkMode = SinkMode.Append,
            versionFrom: Option[Column] = None): Unit = {
    mode match {
      case SinkMode.Keep if tables.containsKey(table) =>
        throw new IllegalStateException(
          s"SinkMode.Keep refuses existing table $table")
      case _ => ()
    }
    val cols = schema.keyField +: schema.valueFields.map(_.name)
    val typed = df.select(cols.map(df.col): _*)
    tables.putIfAbsent(table, new TableState(typed.schema))
    val s = state(table)
    if (mode == SinkMode.Replace) s.synchronized(s.cells.clear())
    // One buffered-mutation flush: explicit event-time versions from
    // `versionFrom`, else a single batch timestamp newer than any cell.
    val batch: Array[(Row, Long)] = versionFrom match {
      case Some(v) =>
        typed.withColumn("__v", v.cast("long")).collect()
          .map(r => (r, r.getLong(r.length - 1)))
      case None =>
        val ts = s.synchronized { s.maxSeen + 1 }
        typed.collect().map(r => (r, ts))
    }
    s.synchronized {
      batch.zipWithIndex.foreach { case ((r, ver), i) =>
        val k = r.get(0)
        val vals = (1 until cols.length).map(r.get)
        s.cells.getOrElseUpdate(k, mutable.ArrayBuffer.empty)
          .append(new Cell(ver, i.toLong, tombstone = false, vals))
        if (ver > s.maxSeen) s.maxSeen = ver
      }
    }
  }

  def delete(keys: DataFrame, table: String, schema: KvSchema): Unit = {
    val s = state(table)
    val ks = keys.select(schema.keyField).collect().map(_.get(0))
    s.synchronized {
      val ts = s.maxSeen + 1
      ks.foreach { k =>
        s.cells.getOrElseUpdate(k, mutable.ArrayBuffer.empty)
          .append(new Cell(ts, 0L, tombstone = true, Nil))
      }
      s.maxSeen = ts
    }
  }

  def maxVersion(spark: SparkSession, table: String): Long =
    state(table).synchronized(state(table).maxSeen)
}

/** The contract is the definition of compatible — and a backend with a
  * completely different storage substrate satisfies it unmodified. */
class InMemoryKvStoreContractSpec extends KvStoreContract {
  private val backend = new InMemoryKvStore
  def store: KvStore = backend
  def tableFor(test: String): String = s"mem-$test"
}
