package graft.kv

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Global secondary index over a KvTable value column — the
  * HBase-ecosystem pattern (Phoenix global indexes, DynamoDB GSIs) for
  * serving value-predicate lookups without scanning the primary: the
  * index IS another KvTable whose rowkey is the composite
  * `<value>\0<primary key>` (the standard byte-concatenated index-key
  * encoding), so a value-equality lookup becomes a rowkey PREFIX scan
  * on the index — planned as an ordinary [[KvTable.readRange]], which
  * prunes index files/row groups by key min/max — followed by a
  * semi-join of the primary's LWW view against the matched keys.
  *
  * Maintenance is INCREMENTAL, driven by the primary's CDC feed
  * ([[KvTable.readChanges]]): `refresh` polls mutations since the
  * index's recorded checkpoint version, reads the changed keys'
  * PRE-IMAGE via [[KvTable.readAsOf]] at the checkpoint (the index
  * entry to retract lives under the OLD value — the pre-image read is
  * how Phoenix global-index writers compute delete-old/put-new pairs),
  * tombstones those entries and appends the current ones. Cost is
  * O(changed keys), not O(table). The checkpoint caveat is
  * [[KvTable.readAsOf]]'s: refresh before major-compacting across the
  * checkpoint.
  *
  * Scale shape: build is one scan + one write, lookup is a pruned
  * range scan + semi-join (broadcast when the match set is small),
  * refresh is two key-filtered scans + two appends — nothing
  * driver-side, no collect.
  */
object KvIndex {

  /** Composite-key separator: sorts before every printable character,
    * so `[v\0, v\1)` brackets exactly the entries whose value is `v`. */
  val Sep = "\u0000"
  private val SepSucc = "\u0001"

  /** Byte-stuff NUL/SOH out of the indexed value before composing the
    * key (`\u0001`->`\u0001\u0002` first, then `\u0000`->`\u0001\u0001`):
    * the encoded value contains no `\u0000`, so a value like "a\u0000b"
    * can no longer fall inside the prefix range computed for value "a"
    * -- the range `[enc(v)\u0000, enc(v)\u0001)` matches exactly the
    * entries whose DECODED value equals `v` (the encoding is injective
    * and NUL-free). Lookup bounds apply the same encoding; ordering
    * between DIFFERENT values may shift, which is fine because the
    * index serves equality prefix scans only. */
  private def escCol(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(c, lit("\u0001"), lit("\u0001\u0002")),
      lit("\u0000"), lit("\u0001\u0001"))

  private def escStr(v: String): String =
    v.replace("\u0001", "\u0001\u0002").replace("\u0000", "\u0001\u0001")

  /** Index table schema: composite rowkey + the primary key echoed as a
    * value column, plus any COVERED primary columns (their values are
    * stored in the index so a covered lookup never touches the primary
    * at all — Phoenix's INCLUDE clause / a DynamoDB GSI projection). */
  def indexSchema(covered: Seq[String]): KvSchema =
    KvSchema.of("__ikey",
      (("__pk" -> ("i", "pk")) +:
        covered.map(c => c -> ("c", c))): _*)

  private def metaFile(indexPath: String) = s"$indexPath/_kvindexmeta.json"

  private def writeIndexMeta(spark: SparkSession, indexPath: String,
                             col: String, covered: Seq[String],
                             checkpoint: Long): Unit =
    MetaSidecar.write(spark, metaFile(indexPath), "col", col,
      "covered", covered, "checkpoint" -> checkpoint)

  /** (indexed column, covered columns, checkpoint version). */
  def readIndexMeta(spark: SparkSession,
                    indexPath: String): (String, Seq[String], Long) = {
    val (c, cov, longs) = MetaSidecar.read(spark, metaFile(indexPath),
      "col", "covered", "checkpoint")
    (c, cov, longs.head)
  }

  private def entriesOf(view: DataFrame, keyField: String, col0: String,
                        covered: Seq[String]): DataFrame =
    view.select(
      concat(escCol(col(col0).cast("string")), lit(Sep),
        col(keyField).cast("string")).as("__ikey") +:
      col(keyField).cast("string").as("__pk") +:
      covered.map(col): _*)

  /** Full build: index every live row's (value, key) pair — plus the
    * `covered` columns' values, stored in the index so covered lookups
    * are index-only; records the primary's current version as the
    * checkpoint `refresh` resumes from. */
  def build(spark: SparkSession, primaryPath: String, indexPath: String,
            valueCol: String, covered: Seq[String] = Seq.empty): Unit = {
    val schema = KvTable.readSchema(spark, primaryPath)
    (valueCol +: covered).foreach(c =>
      require(schema.valueFields.exists(_.name == c),
        s"$c is not a value column of $primaryPath"))
    // checkpoint in the ROW-version domain (maxVersion), not the meta
    // batch counter: on versionFrom (event-time) tables the two domains
    // differ by orders of magnitude, and readAsOf/readChanges bounds
    // below must compare against row __version values
    val checkpoint = KvTable.maxVersion(spark, primaryPath)
    KvTable.write(entriesOf(KvTable.read(spark, primaryPath),
        schema.keyField, valueCol, covered),
      indexPath, indexSchema(covered), SinkMode.Replace)
    writeIndexMeta(spark, indexPath, valueCol, covered, checkpoint)
  }

  /** Incremental maintenance from the primary's change feed: retract
    * the changed keys' OLD entries (pre-image at the checkpoint),
    * append their current ones, advance the checkpoint. Assumes
    * version-monotone appends (true for batch counters and event-time
    * streams): a BACKDATED write (version at or below the checkpoint)
    * is invisible to the feed — rebuild the index after one. */
  def refresh(spark: SparkSession, primaryPath: String,
              indexPath: String): Unit = {
    val (valueCol, covered, checkpoint) = readIndexMeta(spark, indexPath)
    val schema = KvTable.readSchema(spark, primaryPath)
    val key = schema.keyField
    val newCheckpoint = KvTable.maxVersion(spark, primaryPath)
    if (newCheckpoint == checkpoint) return
    val changedKeys = KvTable.readChanges(spark, primaryPath, checkpoint)
      .select(col(key)).distinct()
    // retract pre-image entries (keys that existed at the checkpoint)
    val old = entriesOf(
      KvTable.readAsOf(spark, primaryPath, checkpoint)
        .join(changedKeys, Seq(key), "left_semi"),
      key, valueCol, covered)
    KvTable.delete(old.select(col("__ikey")), indexPath,
      indexSchema(covered))
    // assert current entries (keys still live now)
    val current = entriesOf(
      KvTable.read(spark, primaryPath)
        .join(changedKeys, Seq(key), "left_semi"),
      key, valueCol, covered)
    KvTable.write(current, indexPath, indexSchema(covered), SinkMode.Append)
    writeIndexMeta(spark, indexPath, valueCol, covered, newCheckpoint)
  }

  /** The primary keys whose indexed value equals `value` (as strings —
    * the composite rowkey stores the key's string rendering). */
  def lookupKeys(spark: SparkSession, indexPath: String,
                 value: String): DataFrame =
    KvTable.readRange(spark, indexPath,
        Some(escStr(value) + Sep), Some(escStr(value) + SepSucc))
      .select(col("__pk"))

  /** Covered (index-only) lookup: the covered columns' values straight
    * from the index's prefix scan — ZERO primary IO, the read HBase
    * users build covered indexes for. */
  def lookupCovered(spark: SparkSession, indexPath: String,
                    value: String): DataFrame = {
    val (_, covered, _) = readIndexMeta(spark, indexPath)
    require(covered.nonEmpty,
      s"index $indexPath was built without covered columns")
    KvTable.readRange(spark, indexPath,
        Some(escStr(value) + Sep), Some(escStr(value) + SepSucc))
      .select(col("__pk") +: covered.map(col): _*)
  }

  /** Index-served point query: the primary's LWW rows whose `valueCol`
    * equals `value` — a pruned prefix scan on the index, then a
    * semi-join against the primary (the probe side is the small one;
    * Catalyst broadcasts it). */
  def lookup(spark: SparkSession, primaryPath: String, indexPath: String,
             value: String): DataFrame = {
    val schema = KvTable.readSchema(spark, primaryPath)
    val key = schema.keyField
    val keyType = KvTable.read(spark, primaryPath).schema(key).dataType
    val probes = lookupKeys(spark, indexPath, value)
      .select(col("__pk").cast(keyType).as(key))
    KvTable.read(spark, primaryPath)
      .join(broadcast(probes), Seq(key), "left_semi")
  }
}
