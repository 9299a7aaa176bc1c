package graft.kv

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Incremental cross-table replication over the CDC feed — the HBase
  * WAL-replication analog (a `ReplicationSource` tails the WAL and
  * ships mutation batches to a peer cluster; here the append-only
  * version log IS the WAL and [[KvTable.readChanges]] is the tailer).
  * The reference's deploys pair every cascading.hbase sink table with
  * exactly this kind of peer copy.
  *
  * [[sync]] polls the source's mutations past the replica's recorded
  * checkpoint and appends them to the replica with their ORIGINAL
  * `(version, seq, tombstone)` triples preserved, so the replica's LWW
  * collapse resolves every key — including same-version ties and
  * deletes — exactly as the source does. Replication is therefore
  * idempotent-convergent: any interleaving of syncs ends value-identical
  * to the source view (asserted by ReplicaSpec and the query oracle).
  *
  * Scale shape: one poll costs O(mutations since checkpoint), not
  * O(table) — the version predicate prunes un-changed append batches at
  * the parquet scan via file min/max stats, and the apply is a single
  * partitioned append (no shuffle, no collect). A 100 TB table with a
  * 1 GB/day mutation rate replicates for the cost of reading 1 GB/day.
  *
  * Caveat (shared with [[KvTable.readAsOf]]/[[KvTable.readChanges]]):
  * major compaction rewrites history — sync past a version BEFORE
  * compacting the SOURCE across it, or a tombstone written-then-
  * compacted between polls is never shipped. Compacting the REPLICA is
  * always safe (its collapsed state is what replication maintains).
  */
object KvReplica {

  private def metaFile(replicaPath: String) = s"$replicaPath/_kvreplica.json"

  /** Highest source version already applied to the replica (0 = never
    * synced — the next poll ships the source's whole log). */
  def checkpoint(spark: SparkSession, replicaPath: String): Long =
    if (!MetaSidecar.exists(spark, metaFile(replicaPath))) 0L
    else MetaSidecar.read(spark, metaFile(replicaPath),
      "source", "families", "checkpoint")._3.head

  /** One replication poll: apply every source mutation with
    * `checkpoint < version <= maxVersion(source)` to the replica and
    * advance the checkpoint. Returns the new checkpoint. No-op (and no
    * write at all) when the source has nothing new.
    */
  def sync(spark: SparkSession, sourcePath: String,
           replicaPath: String): Long = {
    val schema = KvTable.readSchema(spark, sourcePath)
    val ckpt = checkpoint(spark, replicaPath)
    if (MetaSidecar.exists(spark, metaFile(replicaPath))) {
      val recorded = MetaSidecar.read(spark, metaFile(replicaPath),
        "source", "families", "checkpoint")._1
      require(recorded == sourcePath,
        s"replica $replicaPath tracks $recorded, not $sourcePath")
    }
    val upper = KvTable.maxVersion(spark, sourcePath)
    if (upper > ckpt) {
      val delta = KvTable.readRaw(spark, sourcePath)
        .filter(col(KvTable.VersionCol) > ckpt &&
          col(KvTable.VersionCol) <= upper)
      KvTable.applyMutations(delta, replicaPath, schema, counterTo = upper)
      MetaSidecar.write(spark, metaFile(replicaPath),
        "source", sourcePath, "families", Seq.empty, "checkpoint" -> upper)
    }
    upper
  }
}
