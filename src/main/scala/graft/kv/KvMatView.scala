package graft.kv

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained materialized aggregate view over a KvTable —
  * the coprocessor-maintained summary-table pattern HBase deployments
  * build by hand (and Phoenix ships as transactional secondary
  * aggregates), re-expressed on the engine's CDC feed: the view is
  * itself a KvTable keyed by the GROUP value, holding distributive
  * aggregates (`cnt` plus one `sum_<c>` per configured column), and
  * `refresh` advances it by DELTA MAINTENANCE instead of recomputation:
  *
  *   new_agg(g) = old_agg(g) + Σ current(changed keys in g)
  *                           − Σ pre-image(changed keys in g)
  *
  * Only keys mutated since the recorded checkpoint are read (the
  * version predicate prunes unchanged append batches at the parquet
  * scan via file min/max stats), so a refresh costs O(changed keys +
  * affected groups), not O(table) — the property that makes a summary
  * view maintainable under a 100 TB base table with a trickle of
  * upserts. Updates that MOVE a key between groups retract from the old
  * group and assert into the new one (the pre-image read is what pays
  * for that, exactly as in [[KvIndex.refresh]]); deletes retract only;
  * groups whose count reaches zero are tombstoned out of the view.
  *
  * Crash safety: aggregate increments are NOT naturally idempotent, so
  * `refresh` journals its window and the view's pre-refresh version
  * BEFORE applying, and a replay after a crash recomputes the SAME
  * delta against the SAME view snapshot (`readAsOf` the journaled
  * version — partially-applied rows carry newer versions and are
  * invisible), making the re-apply value-identical; the journal is
  * cleared only after the checkpoint advances. Same single-writer
  * contract as every other mutation path (one refresher at a time).
  *
  * Aggregate types are pinned at build time: integral sums accumulate
  * in LongType, decimal sums in DecimalType(28, s) (exact cross-engine
  * arithmetic — float sums are order-dependent and are rejected).
  * Distributive-only on purpose: avg is `sum/cnt` at read time; holistic
  * aggregates (median, distinct counts) are not delta-maintainable
  * without sketches and do not belong in this view.
  *
  * Checkpoint caveat shared with every CDC consumer ([[KvTable.readAsOf]]):
  * refresh before major-compacting across the checkpoint, and rebuild
  * after a backdated write (a version at or below the checkpoint is
  * invisible to the feed).
  */
object KvMatView {

  private def metaFile(viewPath: String) = s"$viewPath/_kvmatviewmeta.json"
  private def journalFile(viewPath: String) = s"$viewPath/_kvmvlog.json"

  /** View table schema: rowkey = group value, one `a:` family cell per
    * aggregate (mirrors the reference's fieldMap declaration shape,
    * `HBaseScheme.java:55`). */
  def viewSchema(groupCol: String, sumCols: Seq[String]): KvSchema =
    KvSchema.of(groupCol,
      (("cnt" -> ("a", "cnt")) +:
        sumCols.map(c => s"sum_$c" -> ("a", s"sum_$c"))): _*)

  /** Exact accumulator type for a sum over `dt` (order-independent
    * arithmetic only — see class doc). */
  private def sumType(c: String, dt: DataType): DataType = dt match {
    case d: DecimalType => DecimalType(28, d.scale)
    case ByteType | ShortType | IntegerType | LongType => LongType
    case other => throw new IllegalArgumentException(
      s"KvMatView: sum column $c has non-exact type $other " +
        "(float sums are order-dependent; cast to DECIMAL first)")
  }

  private def writeViewMeta(spark: SparkSession, viewPath: String,
                            groupCol: String, sumCols: Seq[String],
                            checkpoint: Long): Unit =
    MetaSidecar.write(spark, metaFile(viewPath), "group", groupCol,
      "sums", sumCols, "checkpoint" -> checkpoint)

  /** (group column, sum columns, checkpoint version). */
  def readViewMeta(spark: SparkSession,
                   viewPath: String): (String, Seq[String], Long) = {
    val (g, sums, longs) = MetaSidecar.read(spark, metaFile(viewPath),
      "group", "sums", "checkpoint")
    (g, sums, longs.head)
  }

  /** Per-group aggregate rows of `live` (a base LWW view), with the
    * pinned accumulator types. NULL group values are excluded — a
    * rowkey cannot be null, the same rule the base table enforces. */
  private def aggRows(live: DataFrame, groupCol: String,
                      sums: Seq[(String, DataType)]): DataFrame =
    live.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"),
        sums.map { case (c, t) =>
          coalesce(sum(col(c).cast(t)), lit(0).cast(t)).cast(t)
            .as(s"sum_$c")
        }: _*)

  /** Full build: one scan of the base's snapshot AT the recorded
    * checkpoint (`readAsOf` — not the live view, which a concurrent
    * append could advance past the checkpoint and double-count on the
    * first refresh). */
  def build(spark: SparkSession, basePath: String, viewPath: String,
            groupCol: String, sumCols: Seq[String]): Unit = {
    val baseSchema = KvTable.readSchema(spark, basePath)
    (groupCol +: sumCols).foreach(c =>
      require(baseSchema.valueFields.exists(_.name == c),
        s"$c is not a value column of $basePath"))
    require(!sumCols.contains(groupCol),
      s"KvMatView: group column $groupCol cannot also be summed")
    require(sumCols.distinct.size == sumCols.size,
      s"KvMatView: duplicate sum columns in $sumCols")
    val checkpoint = KvTable.maxVersion(spark, basePath)
    val snapshot = KvTable.readAsOf(spark, basePath, checkpoint)
    val sums = sumCols.map(c => c -> sumType(c, snapshot.schema(c).dataType))
    KvTable.write(aggRows(snapshot, groupCol, sums), viewPath,
      viewSchema(groupCol, sumCols), SinkMode.Replace)
    MetaSidecar.delete(spark, journalFile(viewPath)) // stale journal
    writeViewMeta(spark, viewPath, groupCol, sumCols, checkpoint)
  }

  /** Delta maintenance from the base's change feed (see class doc).
    * Reads only the changed keys' pre-image and current rows; upserts
    * affected groups, tombstones emptied ones, advances the checkpoint.
    * Journaled: a crash mid-apply is healed by the next refresh, which
    * replays the identical delta against the journaled view snapshot.
    */
  def refresh(spark: SparkSession, basePath: String,
              viewPath: String): Unit = {
    val (groupCol, sumCols, checkpoint) = readViewMeta(spark, viewPath)
    val baseSchema = KvTable.readSchema(spark, basePath)
    val key = baseSchema.keyField
    val journal = journalFile(viewPath)

    // window + view snapshot: resume a journaled (crashed) apply if one
    // exists, else open a new window and journal it BEFORE applying
    val (fromCp, toCp, viewVerBefore) =
      if (MetaSidecar.exists(spark, journal)) {
        val (_, _, longs) = MetaSidecar.read(spark, journal,
          "group", "sums", "from", "to", "viewver")
        (longs(0), longs(1), longs(2))
      } else {
        val newCheckpoint = KvTable.maxVersion(spark, basePath)
        if (newCheckpoint == checkpoint) return
        val vv = KvTable.maxVersion(spark, viewPath)
        MetaSidecar.write(spark, journal, "group", groupCol,
          "sums", sumCols, "from" -> checkpoint, "to" -> newCheckpoint,
          "viewver" -> vv)
        (checkpoint, newCheckpoint, vv)
      }
    if (checkpoint >= toCp) {
      // crash landed after the meta advance but before the journal
      // delete: the apply completed — just clear the journal
      MetaSidecar.delete(spark, journal)
      return
    }

    val changedKeys = KvTable.readChanges(spark, basePath, fromCp, toCp)
      .select(col(key)).distinct()
    val pre = KvTable.readAsOf(spark, basePath, fromCp)
      .join(changedKeys, Seq(key), "left_semi")
    // snapshot at toCp (not read()): keeps the delta consistent with
    // the journaled window even if the base takes concurrent appends
    val cur = KvTable.readAsOf(spark, basePath, toCp)
      .join(changedKeys, Seq(key), "left_semi")
    val sums = sumCols.map(c => c -> sumType(c, pre.schema(c).dataType))

    // signed union: pre-image contributions retract, current ones assert
    def signed(df: DataFrame, sign: Int): DataFrame =
      df.filter(col(groupCol).isNotNull).select(
        col(groupCol) +:
        lit(sign.toLong).as("__s") +:
        sums.map { case (c, t) => (col(c).cast(t) * sign).cast(t).as(c) }: _*)
    val delta = signed(pre, -1).unionByName(signed(cur, 1))
      .groupBy(col(groupCol))
      .agg(sum(col("__s")).as("dcnt"),
        sums.map { case (c, t) =>
          coalesce(sum(col(c)), lit(0).cast(t)).cast(t).as(s"dsum_$c")
        }: _*)

    // merge with the journaled view SNAPSHOT's rows for the affected
    // groups (replay-stable: partially-applied rows carry versions
    // above viewVerBefore and are invisible); the probe side is small
    // and Catalyst broadcasts it
    val existing = KvTable.readAsOf(spark, viewPath, viewVerBefore)
      .join(delta.select(col(groupCol)), Seq(groupCol), "left_semi")
    val merged = delta.join(existing, Seq(groupCol), "left_outer")
      .select(
        col(groupCol) +:
        (coalesce(col("cnt"), lit(0L)) + col("dcnt")).as("cnt") +:
        sums.map { case (c, t) =>
          (coalesce(col(s"sum_$c"), lit(0).cast(t)) + col(s"dsum_$c"))
            .cast(t).as(s"sum_$c")
        }: _*)
      .localCheckpoint() // merged set is O(affected groups); cut lineage
                         // so the write and the emptied-group probe
                         // don't re-run the two base scans
    val schema = viewSchema(groupCol, sumCols)
    try {
      KvTable.write(merged.filter(col("cnt") > 0), viewPath, schema,
        SinkMode.Append)
      val dead = merged.filter(col("cnt") === 0).select(col(groupCol))
      if (!dead.isEmpty)
        KvTable.delete(dead, viewPath, schema)
      writeViewMeta(spark, viewPath, groupCol, sumCols, toCp)
      MetaSidecar.delete(spark, journal)
    } finally
      // refresh fully consumes the checkpointed merge here — free its
      // blocks so a long-lived session's repeated refreshes don't
      // accumulate orphaned cached RDDs
      graft.dedup.Dedup.freeCheckpoint(merged)
  }

  /** The view's live contents (LWW read of the view table). */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    KvTable.read(spark, viewPath)

  /** Derived average column (`sum/cnt` at read time — see class doc). */
  def avgCol(sumCol: String): Column =
    (col(s"sum_$sumCol") / col("cnt")).as(s"avg_$sumCol")
}
