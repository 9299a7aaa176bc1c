package graft.queries

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Similarity-search EXT queries over the embeddings table. All vector
  * math runs on quantized integers (see [[graft.similarity.Similarity]])
  * so cosine values are bit-identical across engines and partitionings.
  */
object SimQueries {

  private val quantSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT))"

  /** sf-dir of the most recent ANN query/prepare in this JVM. Verify
    * runs every query BEFORE dumping `SparkEntry.oracleSql`, so by dump
    * time the trained-model sidecars for this dir exist and the dynamic
    * oracles below can embed the model as SQL literals (the mirrors are
    * exact: training is deterministic and all scoring is quantized-
    * integer arithmetic both sides). When no ANN query ran, the entries
    * are simply omitted -> driver records a rows-only check. */
  @volatile private var lastDir: Option[String] = None

  /** Train the PQ codebooks once and persist them — the model artifact
    * `ann_pq_topk` serves from. This is the production split PQ
    * assumes: codebooks train OFFLINE (on a sample at corpus scale);
    * encode+search serve online. Bench therefore trains untimed (like
    * scratch-table setup) and times the serving path; Verify rebuilds
    * every run (no reuse marker), so the gate still covers training.
    */
  /** Quantized-centroid sidecar (one `cid:l1,l2,...` line per centroid)
    * — the literal form the dynamic DuckDB oracles embed. */
  private def writeCentsSidecar(file: java.nio.file.Path,
                                cents: org.apache.spark.sql.DataFrame): Unit = {
    java.nio.file.Files.createDirectories(file.getParent)
    val lines = cents.orderBy(col("cid")).collect().map { r =>
      s"${r.getInt(0)}:" +
        r.getSeq[Double](1).map(v => math.round(v * Similarity.Scale)).mkString(",")
    }
    java.nio.file.Files.writeString(file, lines.mkString("\n"))
  }

  private def trainPqModel(s: org.apache.spark.sql.SparkSession,
                           dir: String): Seq[Seq[Seq[Long]]] = {
    val path = scratchDir("ann_pq_model", dir)
    val file = java.nio.file.Paths.get(path, "codebooks.txt")
    lastDir = Some(dir)
    ensureSetup(path) {
      val e = table(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cb = Similarity.pqTrain(corpus, m = 4, k = 16, iters = 2)
      java.nio.file.Files.createDirectories(file.getParent)
      java.nio.file.Files.writeString(file,
        cb.map(_.map(_.mkString(",")).mkString(";")).mkString("\n"))
      // the code table IS the index — build it with the model, serve
      // from it (the PQ analog of the persisted IVF assignment table)
      Similarity.pqEncode(corpus, cb).write.mode("overwrite")
        .parquet(s"$path/codes")
      // the IVF-PQ index: trained routing centroids + per-list codes,
      // both persisted so ann_ivfpq_topk times SERVING, not training
      val cents = Similarity.kmeansCentroids(corpus, k = 16, iters = 3)
      cents.write.mode("overwrite").parquet(s"$path/cents")
      writeCentsSidecar(java.nio.file.Paths.get(path, "cents.txt"), cents)
      Similarity.ivfAssign(corpus, cents).select(col("cid"), col("id"))
        .join(s.read.parquet(s"$path/codes"), "id")
        .write.mode("overwrite").partitionBy("cid")
        .parquet(s"$path/listcodes")
    }
    java.nio.file.Files.readString(file).split('\n').toSeq
      .map(_.split(';').toSeq.map(_.split(',').toSeq.map(_.toLong)))
  }

  private def pqCodes(s: org.apache.spark.sql.SparkSession,
                      dir: String): org.apache.spark.sql.DataFrame =
    s.read.parquet(scratchDir("ann_pq_model", dir) + "/codes")

  /** The SemDeDup corpus: embeddings ∪ perturbed near-copies of every
    * 10th vector (cosine ≈ 0.9987 to their source — over the 0.995
    * prune line). Shared by the model prepare and the serving query so
    * both sides see the identical corpus. */
  private def semCorpus(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    val e = table(s, dir, "embeddings")
    val asD = transform(col("embedding"), x => x.cast("double"))
    val base = e.select(col("vec_id").as("id"), asD.as("vec"))
    val pert = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("id"),
        concat(array(element_at(asD, 1) + lit(0.05)),
          slice(asD, lit(2), size(asD) - 1)).as("vec"))
    base.unionByName(pert)
  }

  /** Train the SemDeDup centroids once and persist them — the same
    * production split as [[trainPqModel]]: clustering trains OFFLINE,
    * the dedup pass serves from the model. Bench trains untimed via
    * `prepares`; Verify rebuilds every run, so the oracle gate still
    * covers training. k follows the √n occupancy rule (fixed k would
    * grow cluster occupancy — and the within-cluster pair work —
    * linearly with the corpus). */
  private def trainSemDedupModel(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame = {
    val path = scratchDir("semdedup_model", dir)
    lastDir = Some(dir)
    ensureSetup(path) {
      val n = table(s, dir, "embeddings").count()
      val k = math.max(16, math.sqrt((n + n / 10) / 8.0).toInt)
      val cents = Similarity.kmeansCentroids(semCorpus(s, dir), k = k, iters = 3)
      cents.write.mode("overwrite").parquet(s"$path/cents")
      writeCentsSidecar(java.nio.file.Paths.get(path, "cents.txt"), cents)
    }
    s.read.parquet(s"$path/cents")
  }

  /** Build the persisted IVF-flat serving index once: trained
    * centroids + the assignment table written `partitionBy("cid")` —
    * the 100 TB layout [[Similarity.ivfAssign]]'s scaladoc promises,
    * where a search becomes a partition-pruned read of only the probed
    * lists (DppSpec pins the DynamicPruningSubquery on the scan).
    * Bench builds untimed via `prepares` so ann_ivf_served times
    * SERVING; Verify rebuilds every run, covering the build. */
  private[graft] def buildServedIvf(s: org.apache.spark.sql.SparkSession,
                                    dir: String): String = {
    val path = scratchDir("ann_served_model", dir)
    lastDir = Some(dir)
    ensureSetup(path) {
      val e = table(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cents = Similarity.kmeansCentroids(corpus, k = 16, iters = 3)
      // parquet round-trips the double centroids exactly, so serving
      // re-quantizes to the identical integer centroids
      cents.write.mode("overwrite").parquet(s"$path/cents")
      writeCentsSidecar(java.nio.file.Paths.get(path, "cents.txt"), cents)
      Similarity.ivfAssign(corpus, cents)
        .write.mode("overwrite").partitionBy("cid")
        .parquet(s"$path/assigned")
      // the standing query set for the SQL surface (graft_ann_topk
      // takes a queries-parquet path; ann_topk_sql points it here)
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .write.mode("overwrite").parquet(s"$path/queries")
    }
    path
  }

  /** The incremental batch appended to the served IVF index:
    * near-copies of every 10th vector under shifted ids (first element
    * +0.05 in double — the semCorpus perturbation, IEEE-identical in
    * the DuckDB mirror). Near-copies of the query vectors (vec_id 0 is
    * both a query and a batch source) MUST surface in the served
    * top-5, so the gate WITNESSES the append: a dropped or misrouted
    * batch changes result rows, not just unqueried index content. */
  private[queries] def ivfAppendBatch(s: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame = {
    val e = table(s, dir, "embeddings")
    val stride = e.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val asD = transform(col("embedding"), x => x.cast("double"))
    e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + stride).as("id"),
        concat(array(element_at(asD, 1) + lit(0.05)),
          slice(asD, lit(2), size(asD) - 1)).as("vec"))
  }

  /** Incremental maintenance for the persisted IVF index — the serving
    * reality ann_ivf_served's build-once layout skips: vectors arrive
    * continuously, and retraining per batch is a full-corpus job you
    * cannot afford per append. Build the base index like
    * [[buildServedIvf]], then assign the NEW batch against the
    * EXISTING centroids read back from the index (NO retrain — the
    * centroid files are written once, before the append) and
    * `mode("append")` into the same cid-partitioned layout: an append
    * touches only the new rows' lists. Drift metrics (per-list counts,
    * base vs appended) go to the `listcounts.txt` sidecar — the signal
    * that tells an operator when list imbalance has drifted far enough
    * to warrant the offline retrain. Serving needs no code change
    * (same layout contract), so DppSpec's partition-pruning guard
    * applies to the appended index too. */
  private def buildAppendedIvf(s: org.apache.spark.sql.SparkSession,
                               dir: String): String = {
    val path = scratchDir("ann_appended_model", dir)
    lastDir = Some(dir)
    ensureSetup(path) {
      buildAppendBase(s, dir, path)
      appendBatch(s, path, ivfAppendBatch(s, dir))
    }
    path
  }

  /** Base index + the durable per-list BASE counts (`basecounts.txt`,
    * written atomically) the drift sidecar is later derived against.
    * Factored from [[buildAppendedIvf]] so IvfIngestCrashSpec can
    * drive [[appendBatch]] against a fresh path directly. */
  private[queries] def buildAppendBase(s: org.apache.spark.sql.SparkSession,
                                       dir: String, path: String): Unit = {
    val e = table(s, dir, "embeddings")
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = Similarity.kmeansCentroids(corpus, k = 16, iters = 3)
    cents.write.mode("overwrite").parquet(s"$path/cents")
    writeCentsSidecar(java.nio.file.Paths.get(path, "cents.txt"), cents)
    Similarity.ivfAssign(corpus, cents)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/assigned")
    val baseCounts = s.read.parquet(s"$path/assigned")
      .groupBy(col("cid")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    atomicWriteFile(s, path, "basecounts.txt",
      baseCounts.keys.toSeq.sorted
        .map(c => s"$c:${baseCounts(c)}").mkString("\n"))
  }

  /** The incremental append: assign the batch against the EXISTING
    * centroids (no retrain), `mode("append")` into the layout, then
    * reconcile the drift sidecar. The sidecar update is the
    * crash-exposed half — Spark's commit protocol covers the data
    * files, but a crash between the data commit and the sidecar write
    * would leave drift counts stale (a silent under-trigger of
    * rebalancing). Recovery is [[refreshDriftSidecar]]: the sidecar is
    * DERIVED state (recounted from the layout + the durable base
    * counts), so re-running the refresh after any crash converges it;
    * IvfIngestCrashSpec injects a kill at exactly that point.
    * `crashAt` is the spec's injection hook (no-op in production). */
  private[queries] def appendBatch(s: org.apache.spark.sql.SparkSession,
                                   path: String,
                                   batch: org.apache.spark.sql.DataFrame,
                                   crashAt: String => Unit = _ => ()): Unit = {
    Similarity.ivfAssign(batch, s.read.parquet(s"$path/cents"))
      .write.mode("append").partitionBy("cid").parquet(s"$path/assigned")
    crashAt("append-committed")
    refreshDriftSidecar(s, path)
  }

  /** Reconcile the drift sidecar with the LAYOUT — the append paths'
    * crash recovery. `after` counts are recounted from the assigned
    * dir itself and `base` comes from the durable `basecounts.txt`
    * written once at build time (absent → 0, the streaming-live case),
    * so this is idempotent and converges the sidecar to the truth no
    * matter where a previous maintenance attempt died. The write is an
    * atomic rename ([[atomicWriteFile]]) — a torn sidecar is
    * impossible. Sidecar format: one `cid:base:after` line per list. */
  private[queries] def refreshDriftSidecar(s: org.apache.spark.sql.SparkSession,
      path: String, assignedSubdir: String = "assigned",
      sidecarName: String = "listcounts.txt"): Unit = {
    // Counts come from the parquet FOOTERS of the layout's data files
    // (exact row counts, summed per cid=<n> path segment) — still
    // "recounted from the layout itself", but as pure FS metadata I/O:
    // no Spark job, no full-data scan. The append/ingest paths call
    // this after EVERY batch commit, so a per-refresh Spark job was a
    // fixed cost linear in batch count (and the scan itself linear in
    // index size — footer reads are linear in FILE count only, the
    // same at any SF for a bounded-file layout). Optimization round
    // r11, guide §5 (driver does no data work) + §1.2 (remove passes).
    val after = footerCountsByCid(s, s"$path/$assignedSubdir")
    val base: Map[Int, Long] = readSmallFile(s, path, "basecounts.txt")
      .map(_.split('\n').filter(_.nonEmpty)
        .map { l => val a = l.split(':'); a(0).toInt -> a(1).toLong }.toMap)
      .getOrElse(Map.empty)
    val lines = after.keys.toSeq.sorted.map { cid =>
      s"$cid:${base.getOrElse(cid, 0L)}:${after(cid)}"
    }
    atomicWriteFile(s, path, sidecarName, lines.mkString("\n"))
  }

  /** Exact per-cid row counts of a cid-partitioned parquet layout from
    * file FOOTERS alone: recursively list `<root>` through the
    * session's Hadoop FS, attribute each data file to its `cid=<n>`
    * path segment, and sum the footer block row counts. Footer counts
    * are exact parquet metadata, so this equals the full-scan
    * `groupBy(cid).count()` by construction (IvfSidecarSpec pins the
    * equality), at pure-metadata cost. */
  private def footerCountsByCid(s: org.apache.spark.sql.SparkSession,
                                root: String): Map[Int, Long] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = s.sessionState.newHadoopConf()
    val rootP = new HPath(root)
    val fs = rootP.getFileSystem(conf)
    // Per-level PARALLEL walk (a serial recursive listing pays one
    // round-trip per directory — ~400 ms for a 50-dir layout on the
    // local FS, far worse on object stores), then parallel footer
    // opens. The merge is a commutative sum, so the result is
    // order-independent.
    import scala.collection.parallel.CollectionConverters._
    def walk(dirs: Seq[org.apache.hadoop.fs.Path],
             acc: Seq[(Int, org.apache.hadoop.fs.FileStatus)])
        : Seq[(Int, org.apache.hadoop.fs.FileStatus)] =
      if (dirs.isEmpty) acc
      else {
        val level = dirs.par.flatMap(d => fs.listStatus(d)).seq
        val (sub, leaves) = level.partition(_.isDirectory)
        val files = leaves.filter { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }.map { st =>
          // cid is a partition-dir segment somewhere above the file
          var p = st.getPath.getParent
          var cid = -1
          while (cid < 0 && p != null && p.toString.length >= root.length) {
            val seg = p.getName
            if (seg.startsWith("cid=")) cid = seg.stripPrefix("cid=").toInt
            p = p.getParent
          }
          require(cid >= 0,
            s"data file outside a cid=<n> partition dir: ${st.getPath}")
          cid -> st
        }
        walk(sub.map(_.getPath), acc ++ files)
      }
    walk(Seq(rootP), Nil).par
      .map { case (cid, st) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val n =
          try reader.getFooter.getBlocks.stream()
            .mapToLong(_.getRowCount).sum()
          finally reader.close()
        cid -> n
      }
      .aggregate(Map.empty[Int, Long])(
        (m, kv) => m.updated(kv._1, m.getOrElse(kv._1, 0L) + kv._2),
        (a, b) => b.foldLeft(a) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, 0L) + v) })
  }

  /** Atomically publish `target` (a centroid-parquet dir name under
    * `path`) as the CURRENT routing set. The ROUTING file is the
    * index's manifest: serving resolves centroids through it, so a
    * vector is visible iff its list's cid is in the routed set, and
    * visibility flips with one atomic rename — the same manifest-swap
    * discipline as KvTable compaction. All manifest I/O goes through
    * the session's Hadoop FS (the index may live on hdfs:// or s3a://,
    * not just a local path — ADVICE r10); the swap is
    * FileContext.rename(OVERWRITE), atomic on HDFS and on the local
    * FS, the contract ATOMIC_MOVE gave the java.nio version. */
  private[queries] def publishRouting(s: org.apache.spark.sql.SparkSession,
                                      path: String, target: String): Unit =
    atomicWriteFile(s, path, "ROUTING", target)

  /** Write a small control file (manifest, sidecar) with an ATOMIC
    * visibility flip: content goes to `<name>.tmp`, then one
    * FileContext.rename(OVERWRITE) — atomic on HDFS and the local FS —
    * installs it. Readers see the old content or the new, never a
    * torn file. All I/O through the session's Hadoop FS so the index
    * may live on hdfs:// or s3a://. */
  private def atomicWriteFile(s: org.apache.spark.sql.SparkSession,
                              dir: String, name: String,
                              content: String): Unit = {
    val conf = s.sessionState.newHadoopConf()
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    val fs = dst.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(dir, name + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(dst).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Read a small control file through the Hadoop FS; None when
    * absent, IOException (loud) when present but unreadable. */
  private def readSmallFile(s: org.apache.spark.sql.SparkSession,
                            dir: String, name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** The centroid-dir name the ROUTING manifest currently points at,
    * or None when the index has no manifest (a plain build-time index
    * that never saw maintenance). Read through the Hadoop FS so
    * hdfs://, s3a:// and file: paths all resolve; an unREADABLE
    * manifest propagates its IOException — serving a rebalanced index
    * from a stale centroid set because the manifest read failed would
    * silently route probes to GC'd lists. */
  private[graft] def routingTarget(s: org.apache.spark.sql.SparkSession,
                                   path: String): Option[String] =
    readSmallFile(s, path, "ROUTING").map(_.trim)

  /** The centroid set the ROUTING manifest currently points at. */
  private[queries] def routedCentroids(s: org.apache.spark.sql.SparkSession,
                                       path: String): org.apache.spark.sql.DataFrame = {
    val name = routingTarget(s, path).getOrElse(
      sys.error(s"no ROUTING manifest at $path"))
    s.read.parquet(s"$path/$name")
  }

  /** Delete every `cid=*` list directory the ROUTING manifest does not
    * reference. Doubles as CRASH RECOVERY (a crash between sub-list
    * append and the routing swap leaves orphan, never-served dirs —
    * this removes them before the next maintenance attempt) and as the
    * post-swap GC of the split-away hot list. Safe at any moment:
    * unrouted dirs are invisible to serving by construction. */
  private[queries] def gcUnroutedLists(s: org.apache.spark.sql.SparkSession,
                                       path: String): Unit = {
    val routed = routedCentroids(s, path).select(col("cid")).collect()
      .map(_.get(0).toString.toInt).toSet
    val assigned = new org.apache.hadoop.fs.Path(path, "assigned")
    val fs = assigned.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.isDirectory(assigned)) {
      fs.listStatus(assigned).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("cid=") && !routed(n.stripPrefix("cid=").toInt))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Base + appended-batch index with the ROUTING manifest initialized
    * to the trained centroid set — the state a drift-triggered split
    * starts from. Factored from the gate build so the crash spec can
    * drive [[rebalanceHotList]] against it directly. */
  private[queries] def buildRebalanceBase(s: org.apache.spark.sql.SparkSession,
                                          dir: String, path: String): Unit = {
    val e = table(s, dir, "embeddings")
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = Similarity.kmeansCentroids(corpus, k = 16, iters = 3)
    cents.write.mode("overwrite").parquet(s"$path/cents")
    writeCentsSidecar(java.nio.file.Paths.get(path, "cents.txt"), cents)
    Similarity.ivfAssign(corpus, cents)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/assigned")
    Similarity.ivfAssign(ivfAppendBatch(s, dir),
        s.read.parquet(s"$path/cents"))
      .write.mode("append").partitionBy("cid").parquet(s"$path/assigned")
    publishRouting(s, path, "cents")
  }

  /** The maintenance step the drift sidecar EXISTS to trigger: when a
    * list has drifted heavy, SPLIT it — locally. Reads the per-list
    * counts over the ROUTED lists, picks the heaviest (deterministic:
    * max count, then min cid), trains TWO sub-centroids on that list's
    * own members (deterministic k-means — a LOCAL re-cluster, never a
    * corpus-wide retrain), assigns only those members to the subs.
    * Every other list is untouched on disk, and its assignments stay
    * STICKY — the defining semantics of incremental IVF maintenance (a
    * vector near the new sub-centroid but living in another list does
    * NOT move; FAISS behaves the same).
    *
    * CRASH-ATOMIC by the ROUTING manifest ([[publishRouting]]): the
    * sub-lists land under NEW cids while ROUTING still names the
    * pre-split set (hot routed, subs invisible); one atomic manifest
    * swap flips to the next GENERATION `cents_g<n+1>` = routed − hot
    * + subs (hot invisible, subs served); only then is the hot dir
    * GC'd. The target dir name is derived from the CURRENT manifest
    * value, never fixed — a fixed name would make the second split
    * read and overwrite the same parquet path (Spark rejects that),
    * capping maintenance at one split per index (ADVICE r10). A crash
    * at ANY point leaves every vector visible through EXACTLY one
    * routed list, and re-running recovers: [[gcUnroutedLists]] first
    * removes any orphan sub-dirs a previous attempt appended (an
    * orphan next-generation centroid dir is simply overwritten — the
    * manifest still names the previous generation, so nothing reads
    * it). IvfRebalanceCrashSpec injects kills at each stage — and
    * runs a SECOND split on a published index — asserting exact-once
    * serving. `crashAt` is the spec's injection hook (no-op in
    * production). */
  private[queries] def rebalanceHotList(s: org.apache.spark.sql.SparkSession,
                                        path: String,
                                        crashAt: String => Unit = _ => ()): Unit = {
    // recovery: drop anything a crashed prior attempt staged
    gcUnroutedLists(s, path)
    val routed = routedCentroids(s, path)
    val routedCids = routed.select(col("cid")).collect()
      .map(_.get(0).toString.toInt).toSet
    // drift counts over ROUTED lists only
    val counts = s.read.parquet(s"$path/assigned")
      .groupBy(col("cid")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.get(0).toString.toInt, r.getLong(1)))
      .filter(c => routedCids(c._1))
    val hot = counts.minBy { case (c, n) => (-n, c) }._1
    require(counts.find(_._1 == hot).exists(_._2 >= 2),
      "hot list too small to split")
    val maxCid = counts.map(_._1).max
    // the hot list's own members (partition-pruned read); vq/Scale
    // re-quantizes to the identical integers
    val hotCorpus = s.read.parquet(s"$path/assigned")
      .filter(col("cid") === hot)
      .select(col("id"), transform(col("vq"),
        x => x.cast("double") / Similarity.Scale).as("vec"))
    val subs = Similarity.kmeansCentroids(hotCorpus, k = 2, iters = 3)
      .select((col("cid") + lit(maxCid + 1)).as("cid"), col("cvec"))
    subs.write.mode("overwrite").parquet(s"$path/subs")
    writeCentsSidecar(java.nio.file.Paths.get(path, "subs.txt"), subs)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "rebalance.txt"), hot.toString)
    // stage the sub-lists under UNROUTED cids — invisible to serving
    Similarity.ivfAssign(hotCorpus, s.read.parquet(s"$path/subs"))
      .write.mode("append").partitionBy("cid").parquet(s"$path/assigned")
    crashAt("staged")
    // post-rebalance routing set: routed minus hot, plus subs — into
    // the NEXT generation dir (current manifest value + 1), so the
    // write never targets the dir `routed` lazily reads from
    val Gen = "cents_g(\\d+)".r
    val nextName = routingTarget(s, path).getOrElse(
        sys.error(s"no ROUTING manifest at $path")) match {
      case Gen(n) => s"cents_g${n.toInt + 1}"
      case _ => "cents_g1"
    }
    routed.filter(col("cid") =!= hot)
      .unionByName(s.read.parquet(s"$path/subs"))
      .write.mode("overwrite").parquet(s"$path/$nextName")
    crashAt("next-cents-written")
    publishRouting(s, path, nextName) // the atomic visibility flip
    crashAt("published")
    gcUnroutedLists(s, path) // drops the now-unrouted hot dir
  }

  private def buildRebalancedIvf(s: org.apache.spark.sql.SparkSession,
                                 dir: String): String = {
    val path = scratchDir("ann_rebalanced_model", dir)
    lastDir = Some(dir)
    ensureSetup(path) {
      buildRebalanceBase(s, dir, path)
      rebalanceHotList(s, path)
    }
    path
  }

  private def deleteRecursively(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
  }

  /** Train-once centroids + a 3-file source directory for the
    * STREAMING ingest query: the corpus arrives as 3 micro-batches
    * (maxFilesPerTrigger=1), the shape of a vector pipeline that never
    * stops receiving embeddings. */
  private def buildStreamIvfModel(s: org.apache.spark.sql.SparkSession,
                                  dir: String): String = {
    val path = scratchDir("ann_stream_model", dir)
    lastDir = Some(dir)
    ensureSetup(path) { buildStreamSrc(s, dir, path) }
    path
  }

  /** [[buildStreamIvfModel]]'s body at an explicit path, so
    * IvfIngestCrashSpec can stage a fresh stream model to crash
    * against. */
  private[queries] def buildStreamSrc(s: org.apache.spark.sql.SparkSession,
                                      dir: String, path: String): Unit = {
    val e = table(s, dir, "embeddings")
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = Similarity.kmeansCentroids(corpus, k = 16, iters = 3)
    cents.write.mode("overwrite").parquet(s"$path/cents")
    writeCentsSidecar(java.nio.file.Paths.get(path, "cents.txt"), cents)
    (0 until 3).foreach { i =>
      e.filter(pmod(col("vec_id"), lit(3)) === i).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append")
        .parquet(s"$path/src")
    }
  }

  /** Drive the micro-batch ingest into `<path>/assigned_live`: each
    * batch's assignment lands in its OWN `bid=<batchId>` partition dir
    * with mode=overwrite — an IDEMPOTENT write, so a batch REPLAYED
    * after a crash (data committed, checkpoint offset not yet) simply
    * overwrites its own output instead of `mode("append")`-duplicating
    * it: exactly-once serving from a non-transactional parquet sink.
    * (`bid` is just a second partition level; serving's cid pruning is
    * unaffected.) After each batch commit the drift sidecar
    * (`listcounts_live.txt`) is reconciled FROM THE LAYOUT
    * ([[refreshDriftSidecar]]) — a crash between the two leaves a
    * stale sidecar that the next refresh heals. IvfIngestCrashSpec
    * kills a mid-stream batch after its data commit and asserts both
    * properties across a checkpointed restart. `crashAt` is the
    * spec's injection hook (no-op in production). */
  private[queries] def ingestStream(s: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType,
      checkpoint: Option[String] = None,
      crashAt: Long => Unit = _ => ()): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val live = s"$path/assigned_live"
    val cents = s.read.parquet(s"$path/cents")
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$path/src")
    val writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        Similarity.ivfAssign(
            batch.select(col("vec_id").as("id"), col("embedding").as("vec")),
            cents)
          .write.mode("overwrite").partitionBy("cid")
          .parquet(s"$live/bid=$bid")
        crashAt(bid)
        refreshDriftSidecar(s, path, "assigned_live", "listcounts_live.txt")
      }
    val q = checkpoint.fold(writer)(cp =>
        writer.option("checkpointLocation", cp))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  val prepares: Map[String, (org.apache.spark.sql.SparkSession, String) => Unit] =
    checked("ann_pq_topk" -> ((s, d) => { trainPqModel(s, d); () }),
      "ann_ivfpq_topk" -> ((s, d) => { trainPqModel(s, d); () }),
      "ann_ivf_served" -> ((s, d) => { buildServedIvf(s, d); () }),
      "ann_topk_sql" -> ((s, d) => { buildServedIvf(s, d); () }),
      "ann_mmr_ivf" -> ((s, d) => { buildServedIvf(s, d); () }),
      "ann_ivf_appended" -> ((s, d) => { buildAppendedIvf(s, d); () }),
      "ann_ivf_rebalanced" -> ((s, d) => { buildRebalancedIvf(s, d); () }),
      "ann_ivf_stream_ingest" -> ((s, d) => { buildStreamIvfModel(s, d); () }),
      "dedup_semantic" -> ((s, d) => { trainSemDedupModel(s, d); () }))

  val defs: Map[String, Q] = checked(
    // Exact brute-force top-5 cosine neighbors for the first 10 vectors:
    // query side broadcast, corpus scanned once, per-query heap via
    // window rank.
    "ann_topk" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteForceTopK(queries, corpus, 5)
        .orderBy(col("qid"), col("rank"))
    },

    // MMR diversified re-ranking — top-20 retrieval then 5 greedy
    // picks maximizing 0.7·rel − 0.3·max-sim-to-picked, unrolled into
    // declarative steps so the lossy-looking re-ranker is hash-gate
    // exact (see Similarity.mmrRerank).
    "ann_mmr" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.mmrRerank(queries, corpus, k = 5, pool = 20)
    },

    // MMR at the 100 TB shape: the candidate pool is drawn from the
    // SERVED IVF index (broadcast probe join + DPP-pruned read of only
    // the probed list directories — DppSpec pins the pruning subquery)
    // instead of ann_mmr's brute-force corpus scoring, and the pool
    // rows carry their quantized vectors out of the index so the
    // greedy unroll never re-touches the corpus. ann_mmr stays the
    // exact-pool baseline; this is the path that scales (pool quality
    // = the index's recall at nprobe=4). Oracle: the served-centroid
    // IVF mirror builds the same pool, then the same CTE-for-CTE
    // greedy unroll as ann_mmr.
    "ann_mmr_ivf" -> { (s, dir) =>
      val path = buildServedIvf(s, dir)
      val pool = Similarity.ivfSearchAssigned(
        s.read.parquet(s"$path/assigned"),
        s.read.parquet(s"$path/queries"),
        s.read.parquet(s"$path/cents"), nprobe = 4, k = 20, keepVec = true)
      Similarity.mmrRerankPool(
        pool.select(col("qid"), col("id"), col("vq").as("cq"),
          col("cosine").as("rel")), k = 5)
    },

    // Hard-negative mining for the first 10 query vectors: top-5
    // most-similar DIFFERENT-label corpus vectors (contrastive-
    // training negatives; same-label rows are positives and excluded
    // inside the broadcast-join condition, before any exchange).
    "ann_hard_negatives" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label"))
      Similarity.hardNegatives(queries, corpus, 5)
        .orderBy(col("qid"), col("rank"))
    },

    // Fixed-radius (range) search: all corpus vectors with cosine
    // >= 0.3 to each of the first 10 vectors — the ε-NN primitive
    // next to top-k. Exact baseline: broadcast queries, one corpus
    // scan, threshold filter before any exchange.
    "ann_range_search" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.rangeSearch(queries, corpus, minCosine = 0.3)
        .orderBy(col("qid"), col("id"))
    },

    // IVF-pruned EXACT range search — ann_range_search's scale path:
    // trained k-means lists + the spherical-triangle-inequality bound
    // prune lists that cannot contain a cosine >= 0.3 match. Pruning
    // is exact, so the oracle is the BRUTE-FORCE range mirror: any
    // pruning bug loses rows and the value-level gate goes red.
    "ann_ivf_range" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val k = math.max(16, math.sqrt(e.count() / 8.0).toInt)
      val cents = Similarity.kmeansCentroids(corpus, k = k, iters = 3)
      Similarity.ivfRangeSearch(queries, corpus, cents, minCosine = 0.3)
        .orderBy(col("qid"), col("id"))
    },

    // IVF-flat ANN: deterministic centroid subset, nprobe=4 of the
    // inverted lists searched per query. The centroid BUDGET follows
    // the k ≈ √n IVF rule via the subset stride: stride = max(40,
    // ⌊√(0.8·n)⌋), which is exactly 40 at the sf0.01 gate and at sf0.1
    // (static %40 DuckDB mirror stays valid there). A fixed stride
    // makes |cents| grow linearly and assignment cost n·|cents| = n²/40
    // — measured 52× at 10× rows before this.
    "ann_ivf_topk" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val stride = math.max(40L, math.sqrt(0.8 * e.count()).toLong)
      val cents = e.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfTopK(queries, corpus, cents, nprobe = 4, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // IVF with TRAINED centroids: deterministic k-means (hash-spread
    // init, exact integer means) replaces the naive every-40th-vector
    // subset — the full train→assign→search pipeline in one query.
    // Engine-specific training -> rows-only driver check; run-to-run
    // determinism is asserted by QueryDeterminismSpec like every query,
    // and centroid/search correctness by SimilaritySpec.
    // PQ-compressed ANN — train→encode→ADC-scan→exact-rerank, the
    // memory-bandwidth path for billion-vector corpora: vectors travel
    // as 4 codebook codes (16× smaller than the 64 floats), scanning
    // costs 4 table lookups per vector, and only the top-50 candidates
    // touch real vectors for the exact integer-cosine rerank.
    // Engine-specific compression -> rows-only driver check; recall,
    // code purity, and training determinism are spec-asserted
    // (SimilaritySpec), run-to-run determinism by QueryDeterminismSpec.
    "ann_pq_topk" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cb = trainPqModel(s, dir) // persisted model; trains if absent
      Similarity.pqSearchEncoded(queries, pqCodes(s, dir), corpus, cb,
          rerank = 50, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // IVF-PQ — the production serving shape (FAISS IVFx,PQy): trained
    // k-means routing prunes to nprobe lists, the in-list scan is PQ
    // ADC lookups, the exact integer-cosine rerank restores precision.
    // Serves from the PERSISTED index (centroids + per-list codes,
    // partitioned by cid so probed lists partition-prune) — training
    // and encoding happen in the prepare, like every other index.
    // Engine-specific compression -> rows-only gate; recall vs the
    // exact scan spec-asserted (ExtSpec).
    "ann_ivfpq_topk" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cb = trainPqModel(s, dir)
      val model = scratchDir("ann_pq_model", dir)
      Similarity.ivfPqSearchEncoded(queries,
          s.read.parquet(s"$model/listcodes"), corpus,
          s.read.parquet(s"$model/cents"), cb,
          nprobe = 4, rerank = 40, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // IVF-flat SERVED from the persisted index — the layout every IVF
    // scaladoc in Similarity points at for 100 TB: the assignment
    // table lives on disk partitioned by cid, so the broadcast probe
    // join partition-prunes the scan to the probed lists (DppSpec
    // asserts the DynamicPruningSubquery; at cluster scale that is
    // "read nprobe/k of the corpus", the entire point of IVF).
    // Training and the index build happen in the prepare; the query
    // times pure serving. Same trained centroids + search params as
    // ann_kmeans_ivf, so served == inline is also gate-asserted
    // (their oracles are the same mirror over each one's sidecar).
    "ann_ivf_served" -> { (s, dir) =>
      val path = buildServedIvf(s, dir)
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfSearchAssigned(s.read.parquet(s"$path/assigned"),
          queries, s.read.parquet(s"$path/cents"), nprobe = 4, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // The SAME served-IVF retrieval reached through SQL — graft_ann_topk
    // is a registered TABLE function (graft.functions.TableFns /
    // GraftExtensions) expanding to ivfSearchAssigned's plan at
    // analysis, so SQL users get the identical partition-pruned probe
    // shape and the gate runs the identical ann_ivf_served oracle
    // end-to-end through spark.sql(...). SqlSurfaceSpec additionally
    // pins SQL == DataFrame row-for-row and the literal-vector form.
    "ann_topk_sql" -> { (s, dir) =>
      val path = buildServedIvf(s, dir)
      graft.functions.TableFns.register(s)
      s.sql(s"SELECT * FROM graft_ann_topk('$path', '$path/queries', 4, 5) " +
        "ORDER BY qid, rank")
    },

    // IVF-flat served AFTER an incremental append — same serving code
    // and layout as ann_ivf_served, but the index now holds base +
    // appended lists (buildAppendedIvf: new batch assigned to the
    // EXISTING centroids, no retrain). The oracle recomputes the whole
    // search over the UNION corpus (base ∪ reversed batch) from the
    // sidecar centroids, so a routing bug in the append path (wrong
    // list, dropped batch, double append) goes value-red.
    "ann_ivf_appended" -> { (s, dir) =>
      val path = buildAppendedIvf(s, dir)
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfSearchAssigned(s.read.parquet(s"$path/assigned"),
          queries, s.read.parquet(s"$path/cents"), nprobe = 4, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // Served AFTER a drift-triggered list SPLIT: the heaviest list's
    // members re-cluster into two sub-lists (local 2-means, no
    // corpus-wide retrain), queries route over the post-rebalance
    // centroid set, every other list stays sticky on disk. The oracle
    // recomputes the TWO-STAGE sticky assignment (original routing,
    // then sub-routing for hot members only) over the union corpus —
    // misrouted sticky members or a dropped sub-list go value-red.
    // Serving resolves centroids through the ROUTING manifest, the
    // crash-atomicity seam (IvfRebalanceCrashSpec): a vector is served
    // iff its list is routed, and routing swaps atomically.
    "ann_ivf_rebalanced" -> { (s, dir) =>
      val path = buildRebalancedIvf(s, dir)
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfSearchAssigned(s.read.parquet(s"$path/assigned"),
          queries, routedCentroids(s, path), nprobe = 4, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // STREAMING ingestion into the serving layout — the continuous
    // form of ann_ivf_appended: a REAL Structured-Streaming query
    // (file source, 3 micro-batches via maxFilesPerTrigger=1,
    // AvailableNow) assigns each arriving batch to the EXISTING
    // trained centroids inside foreachBatch and appends into the
    // cid-partitioned layout; serving then reads the live index. The
    // final state is batching-INSENSITIVE (assignment is stateless per
    // vector), so the DuckDB mirror over the whole corpus gates a
    // genuinely streaming execution value-level — the same trick as
    // every stream_* query. The live layout resets per run (each run
    // re-ingests); production ingestion would ride the kvtable epoch
    // ledger for exactly-once (kv_stream_* queries pin that machinery).
    "ann_ivf_stream_ingest" -> { (s, dir) =>
      val path = buildStreamIvfModel(s, dir)
      val live = s"$path/assigned_live"
      deleteRecursively(live)
      val e = table(s, dir, "embeddings")
      ingestStream(s, path, e.schema)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfSearchAssigned(s.read.parquet(live), queries,
          s.read.parquet(s"$path/cents"), nprobe = 4, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    "ann_kmeans_ivf" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cents = Similarity.kmeansCentroids(corpus, k = 16, iters = 3)
      // kmeansCentroids returns driver-local data, so the sidecar write
      // is free; it lets the dynamic oracle mirror assignment + search
      // over the TRAINED centroids as literals (training itself is the
      // deterministic part the oracle takes as given).
      writeCentsSidecar(java.nio.file.Paths.get(
        scratchDir("ann_kmeans_model", dir), "cents.txt"), cents)
      lastDir = Some(dir)
      Similarity.ivfTopK(queries, corpus, cents, nprobe = 4, k = 5)
        .orderBy(col("qid"), col("rank"))
    },

    // SemDeDup (the published semantic-dedup method) over the
    // [[semCorpus]] (embeddings ∪ planted near-copies). k-means
    // clusters bound the candidate space; the order-free dominance
    // rule prunes within clusters (keep the most central of any
    // over-threshold pair). Serves from the TRAINED persisted model
    // ([[trainSemDedupModel]] — the production train/serve split);
    // the centroids ship to the oracle as literals via the sidecar, so
    // the mirror is SF-independent by construction.
    "dedup_semantic" -> { (s, dir) =>
      val cents = trainSemDedupModel(s, dir)
      Similarity.semanticDedup(semCorpus(s, dir), cents, minCosine = 0.995)
        .orderBy(col("id"))
    },

    // Angular-LSH bucketed near-dup pairs: corpus ∪ perturbed copies of
    // every 10th vector (first component +0.05 → cosine ≈ 0.9987).
    // Signature width follows the library's own sizing rule (raise bits
    // so expected bucket occupancy n/2^bits stays bounded): bits =
    // max(8, ceil(log2(n/10))). With fixed 8-bit signatures the
    // within-bucket pair count grows as n²/256 — measured 69× at 10×
    // rows before this. The formula yields 8 bits at the sf0.01 oracle
    // gate AND at sf0.1 (static 8-plane DuckDB mirror stays exact
    // there); bigger corpora trade a little planted-pair recall for
    // linear bucket work, the textbook LSH bits/recall dial.
    "ann_lsh_neardup" -> { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val asDouble = transform(col("embedding"), x => x.cast("double"))
      val base = e.select(col("vec_id").as("id"), asDouble.as("vec"))
      val pert = e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("id"),
          concat(array(element_at(asDouble, 1) + lit(0.05)),
            slice(asDouble, lit(2), size(asDouble) - 1)).as("vec"))
      val n = e.count(); val corpusN = n + n / 10
      val bits = math.max(8,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, corpusN / 10 - 1)))
      // The DuckDB mirror (annLshSql) materializes exactly 20 candidate
      // plane terms; past ~5M vectors the formula would ask for a 21st
      // and the mirror would SILENTLY drop high-order planes and
      // spuriously fail the gate. Fail the query loudly instead — the
      // gate query and its mirror must widen together.
      require(bits <= 20,
        s"ann_lsh_neardup gate mirror covers <=20 LSH planes; corpus of " +
          s"$corpusN vectors needs $bits. Extend annLshSql's plane list " +
          "in step with this formula before gating at this scale.")
      Similarity.lshNearDupPairs(base.unionByName(pert), "id", "vec",
          dims = 64, minCosine = 0.995, bits = bits)
        .orderBy(col("id1"), col("id2"))
    }
  )

  private val annTopkSql =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, $quantSql AS qq
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS id, $quantSql AS cq FROM embeddings),
       |s AS (
       |  SELECT qid, id,
       |    list_dot_product(qq, cq)
       |      / (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(cq, cq)))
       |      AS cosine
       |  FROM q, c WHERE qid <> id)
       |SELECT qid, id, cosine, rank FROM (
       |  SELECT qid, id, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id)
       |      AS INT) AS rank
       |  FROM s)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  private val annHardNegSql =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, label AS qlabel, $quantSql AS qq
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS id, label, $quantSql AS cq FROM embeddings),
       |s AS (
       |  SELECT qid, qlabel, id, label,
       |    list_dot_product(qq, cq)
       |      / (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(cq, cq)))
       |      AS cosine
       |  FROM q, c WHERE qid <> id AND qlabel <> label)
       |SELECT qid, qlabel, id, label, cosine, rank FROM (
       |  SELECT qid, qlabel, id, label, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id)
       |      AS INT) AS rank
       |  FROM s)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  // Re-derives Native.planeWeight from its formula (avalanche mixer on
  // the (p,i) seed, then [-999,999]) so the oracle independently checks
  // the engine's plane family, not just its bucketing. Intermediates
  // are inlined twice (no lets in DuckDB lambdas); all values stay
  // non-negative BIGINT so %4294967296 == the engine's 32-bit mask.
  private def planeWSql(p: Int): String = {
    val x0 = s"((CAST($p AS BIGINT)*73856093 + i*19349663) % 4294967296)"
    val x1 = s"((xor($x0, $x0 >> 16) * 741103597) % 4294967296)"
    val x2 = s"((xor($x1, $x1 >> 16) * 695847673) % 4294967296)"
    s"((xor($x2, $x2 >> 16) % 1999) - 999)"
  }

  private val annLshSql = {
    // Deterministic hyperplane sign bits, generated to match
    // Similarity.hyperplaneSig exactly. The query log-scales its
    // signature WIDTH with the corpus (bits = max(8, 64 −
    // numberOfLeadingZeros(corpusN/10 − 1))), so the mirror computes
    // the same width IN SQL — length(bin(x)) is DuckDB's integer-exact
    // bit width — and sums plane p with weight 2^(bits−1−p) only while
    // p < bits (20 candidate planes cover corpora to ~5M vectors; a
    // static 8-plane mirror held only at the gate sizes and would
    // value-mismatch from sf1 up). Bucket degradation mirrors the
    // engine exactly: all-pairs for buckets of 2..1000 members, STAR
    // (pivot = min id) pairs for 1001..10000, dropped above — the
    // literals are Dedup.DefaultStarBucket / DefaultMaxBucket.
    val bits = (0 to 19).map { p =>
      s"""(CASE WHEN $p < nbits AND list_sum(list_transform(range(1, 65),
         |  i -> q[i] * ${planeWSql(p)})) >= 0
         |  THEN CAST(1 AS BIGINT) << (nbits - 1 - $p) ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""WITH nb AS (
       |  SELECT CASE WHEN nbits0 > 20 THEN CAST(error(
       |      'ann_lsh_neardup oracle mirror generates 20 planes; nbits='
       |        || nbits0 || ' needs more — extend planeWSql coverage')
       |      AS INT) ELSE nbits0 END AS nbits
       |  FROM (
       |    SELECT GREATEST(8, length(bin(GREATEST(1, (cnt + cnt//10)//10 - 1))))
       |      AS nbits0
       |    FROM (SELECT count(*) AS cnt FROM embeddings))),
       |corpus AS (
       |  SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS id,
       |    [list_transform(embedding, x -> CAST(x AS DOUBLE))[1] + 0.05]
       |      || list_transform(embedding, x -> CAST(x AS DOUBLE))[2:len(embedding)] AS vec
       |  FROM embeddings WHERE vec_id % 10 = 0),
       |qv AS (
       |  SELECT id, list_transform(vec, x -> CAST(round(x*10000) AS BIGINT)) AS q
       |  FROM corpus),
       |sigs AS (SELECT id, q, $bits AS sig FROM qv, nb),
       |oks AS (
       |  SELECT sig, COUNT(*) AS m, MIN(id) AS pivot
       |  FROM sigs GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 10000),
       |cand AS (
       |  SELECT a.id AS id1, a.q AS q1, b.id AS id2, b.q AS q2
       |  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.id < b.id
       |  JOIN oks o ON o.sig = a.sig AND o.m <= 1000
       |  UNION ALL
       |  SELECT p.id AS id1, p.q AS q1, b.id AS id2, b.q AS q2
       |  FROM oks o
       |  JOIN sigs p ON p.sig = o.sig AND p.id = o.pivot
       |  JOIN sigs b ON b.sig = o.sig AND b.id <> o.pivot
       |  WHERE o.m > 1000)
       |SELECT id1, id2, cosine FROM (
       |  SELECT id1, id2,
       |    list_dot_product(q1, q2)
       |      / (sqrt(list_dot_product(q1, q1)) * sqrt(list_dot_product(q2, q2)))
       |      AS cosine
       |  FROM cand)
       |WHERE cosine >= 0.995
       |ORDER BY id1, id2""".stripMargin
  }

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** MMR mirror: the same greedy recurrence unrolled step-for-step
    * (sel1 = argmax rel; selT = selT-1 + argmax 0.7·rel − 0.3·max sim
    * to selT-1, ties by id) over the identical quantized-cosine
    * candidate/pair tables. */
  /** The k-step greedy MMR unroll, CTE-for-CTE against
    * [[Similarity.mmrRerankPool]], parameterized only by the upstream
    * `cand` (qid, id, cq, rel) CTE — shared by the brute-force-pooled
    * mirror (ann_mmr) and the IVF-pooled one (ann_mmr_ivf). Expects a
    * WITH list already open; emits `pair`, `sel1..sel$k` and the
    * final SELECT. */
  private def mmrGreedySql(k: Int): String = {
    def step(t: Int): String =
      s"""pick$t AS (
         |  SELECT qid, id, $t AS mmr_rank, rel FROM (
         |    SELECT c.qid, c.id, c.rel,
         |      row_number() OVER (PARTITION BY c.qid
         |        ORDER BY 0.7 * c.rel - 0.3 * m.ms DESC, c.id) AS rk
         |    FROM cand c
         |    JOIN (SELECT p.qid, p.a AS id, MAX(p.sim) AS ms
         |          FROM pair p
         |          JOIN sel${t - 1} s ON s.qid = p.qid AND s.id = p.b
         |          GROUP BY p.qid, p.a) m USING (qid, id)
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s2
         |                      WHERE s2.qid = c.qid AND s2.id = c.id))
         |  WHERE rk = 1),
         |sel$t AS (SELECT * FROM sel${t - 1}
         |          UNION ALL SELECT * FROM pick$t)""".stripMargin
    s"""pair AS MATERIALIZED (
       |  SELECT a.qid, a.id AS a, b.id AS b,
       |    ${cosSql("a.cq", "b.cq")} AS sim
       |  FROM cand a JOIN cand b
       |    ON a.qid = b.qid AND a.id <> b.id),
       |sel1 AS (
       |  SELECT qid, id, 1 AS mmr_rank, rel FROM (
       |    SELECT qid, id, rel, row_number() OVER (PARTITION BY qid
       |      ORDER BY rel DESC, id) AS rk FROM cand)
       |  WHERE rk = 1),
       |${(2 to k).map(step).mkString(",\n")}
       |SELECT qid, CAST(mmr_rank AS INT) AS mmr_rank, id, rel
       |FROM sel$k ORDER BY qid, mmr_rank""".stripMargin
  }

  private val mmrSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, $quantSql AS qq
       |  FROM embeddings WHERE vec_id < 10),
       |c0 AS (SELECT vec_id AS id, $quantSql AS cq FROM embeddings),
       |s0 AS (
       |  SELECT qid, id, cq, ${cosSql("qq", "cq")} AS rel
       |  FROM q, c0 WHERE qid <> id),
       |cand AS MATERIALIZED (
       |  SELECT qid, id, cq, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY rel DESC, id) AS rk FROM s0)
       |  WHERE rk <= 20),
       |${mmrGreedySql(5)}""".stripMargin

  /** ann_mmr_ivf mirror: the pool is the served-index probe (the
    * ann_ivf_served mirror's assigned/probed CTEs over the TRAINED
    * centroid literals) ranked to 20 per query, then the identical
    * greedy unroll — so a pool that drifts from the index's top-20
    * (lost DPP rows, wrong probe set, a dropped keepVec vector) goes
    * value-red even where the final 5 picks would happen to agree. */
  private def mmrIvfSql(centsCte: String): String = {
    val cos = cosSql _
    s"""WITH cents AS ($centsCte),
       |corpus AS (SELECT vec_id AS id, $quantSql AS vq FROM embeddings),
       |assigned AS (
       |  SELECT id, cid, vq FROM (
       |    SELECT c.id, ct.cid, c.vq,
       |      row_number() OVER (PARTITION BY c.id
       |        ORDER BY ${cos("c.vq", "ct.cq")} DESC, ct.cid) AS rn
       |    FROM corpus c, cents ct)
       |  WHERE rn = 1),
       |queries AS (
       |  SELECT vec_id AS qid, $quantSql AS qq
       |  FROM embeddings WHERE vec_id < 10),
       |probed AS (
       |  SELECT qid, cid, qq FROM (
       |    SELECT q.qid, ct.cid, q.qq,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${cos("q.qq", "ct.cq")} DESC, ct.cid) AS rn
       |    FROM queries q, cents ct)
       |  WHERE rn <= 4),
       |cand AS MATERIALIZED (
       |  SELECT qid, id, cq, rel FROM (
       |    SELECT p.qid, a.id, a.vq AS cq, ${cos("p.qq", "a.vq")} AS rel,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY ${cos("p.qq", "a.vq")} DESC, a.id) AS rk
       |    FROM probed p JOIN assigned a ON p.cid = a.cid
       |    WHERE p.qid <> a.id)
       |  WHERE rk <= 20),
       |${mmrGreedySql(5)}""".stripMargin
  }

  /** SemDeDup mirror with the trained centroids as a pluggable CTE:
    * same corpus ∪ perturbed-copies construction as the LSH mirror,
    * the assignment CTE from the IVF mirror (highest cosine, then
    * lowest cid), the LSH mirror's three cluster-size regimes
    * (all-pairs ≤ 1000, pivot pairs to 10000, dropped above — the
    * literals are Dedup.DefaultStarBucket / DefaultMaxBucket), and the
    * dominance rule verbatim: of an over-threshold pair the less
    * central member (tie: higher id) drops. */
  private def semDedupSql(centsCte: String): String = {
    val cos = cosSql _
    s"""WITH cents AS ($centsCte),
       |corpus AS (
       |  SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS id,
       |    [list_transform(embedding, x -> CAST(x AS DOUBLE))[1] + 0.05]
       |      || list_transform(embedding, x -> CAST(x AS DOUBLE))[2:len(embedding)] AS vec
       |  FROM embeddings WHERE vec_id % 10 = 0),
       |qv AS (
       |  SELECT id, list_transform(vec, x -> CAST(round(x*10000) AS BIGINT)) AS vq
       |  FROM corpus),
       |assign AS (
       |  SELECT id, vq, cid, ccos FROM (
       |    SELECT c.id, c.vq, ct.cid, ${cos("c.vq", "ct.cq")} AS ccos,
       |      row_number() OVER (PARTITION BY c.id
       |        ORDER BY ${cos("c.vq", "ct.cq")} DESC, ct.cid) AS rn
       |    FROM qv c, cents ct) WHERE rn = 1),
       |oks AS (
       |  SELECT cid, COUNT(*) AS m, MIN(id) AS pivot FROM assign GROUP BY 1
       |  HAVING COUNT(*) BETWEEN 2 AND 10000),
       |cand AS (
       |  SELECT a.id AS id1, a.vq AS q1, a.ccos AS c1,
       |         b.id AS id2, b.vq AS q2, b.ccos AS c2
       |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.id < b.id
       |  JOIN oks o ON o.cid = a.cid AND o.m <= 1000
       |  UNION ALL
       |  SELECT p.id, p.vq, p.ccos, b.id, b.vq, b.ccos
       |  FROM oks o
       |  JOIN assign p ON p.cid = o.cid AND p.id = o.pivot
       |  JOIN assign b ON b.cid = o.cid AND b.id <> o.pivot
       |  WHERE o.m > 1000),
       |dropped AS (
       |  SELECT DISTINCT CASE WHEN c1 < c2 OR (c1 = c2 AND id1 > id2)
       |    THEN id1 ELSE id2 END AS id
       |  FROM cand WHERE ${cos("q1", "q2")} >= 0.995)
       |SELECT a.id, a.cid, a.ccos, d.id IS NULL AS kept
       |FROM assign a LEFT JOIN dropped d ON d.id = a.id
       |ORDER BY a.id""".stripMargin
  }

  /** IVF-flat mirror with a pluggable centroid CTE — shared by
    * `ann_ivf_topk` (centroids = every-40th-vector subset, plain SQL)
    * and `ann_kmeans_ivf` / `ann_ivf_served` (TRAINED centroids
    * embedded as literals) — and a pluggable corpus CTE so
    * `ann_ivf_appended` can mirror the post-append index (base ∪
    * reversed batch). */
  private def ivfSqlWithCents(centsCte: String,
      corpusCte: String =
        s"SELECT vec_id AS id, $quantSql AS vq FROM embeddings"): String = {
    val cos = cosSql _
    s"""WITH cents AS ($centsCte),
       |corpus AS ($corpusCte),
       |assigned AS (
       |  SELECT id, cid, vq FROM (
       |    SELECT c.id, ct.cid, c.vq,
       |      row_number() OVER (PARTITION BY c.id
       |        ORDER BY ${cos("c.vq", "ct.cq")} DESC, ct.cid) AS rn
       |    FROM corpus c, cents ct)
       |  WHERE rn = 1),
       |queries AS (
       |  SELECT vec_id AS qid, $quantSql AS qq
       |  FROM embeddings WHERE vec_id < 10),
       |probed AS (
       |  SELECT qid, cid, qq FROM (
       |    SELECT q.qid, ct.cid, q.qq,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${cos("q.qq", "ct.cq")} DESC, ct.cid) AS rn
       |    FROM queries q, cents ct)
       |  WHERE rn <= 4)
       |SELECT qid, id, cosine, rank FROM (
       |  SELECT p.qid, a.id, ${cos("p.qq", "a.vq")} AS cosine,
       |    CAST(row_number() OVER (PARTITION BY p.qid
       |      ORDER BY ${cos("p.qq", "a.vq")} DESC, a.id) AS INT) AS rank
       |  FROM probed p JOIN assigned a ON p.cid = a.cid
       |  WHERE p.qid <> a.id)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** Post-rebalance mirror: assignment is TWO-STAGE STICKY — every
    * vector routes over the ORIGINAL centroids; only members of the
    * split (hot) list re-route over the two sub-centroids. Queries
    * probe the post-rebalance set (original minus hot, plus subs).
    * Mirrors [[buildRebalancedIvf]]'s semantics exactly — a global
    * re-assignment over the new set would NOT match (sticky lists are
    * the defining property of incremental maintenance). */
  private def ivfRebalancedSql(orig: Seq[(Int, Seq[Long])],
                               subs: Seq[(Int, Seq[Long])], hot: Int,
                               corpusCte: String): String = {
    val cos = cosSql _
    s"""WITH cents0 AS (${centsValuesCte(orig)}),
       |subs AS (${centsValuesCte(subs)}),
       |cents2 AS (
       |  SELECT * FROM cents0 WHERE cid <> $hot
       |  UNION ALL SELECT * FROM subs),
       |corpus AS ($corpusCte),
       |a1 AS (
       |  SELECT id, cid AS cid0, vq FROM (
       |    SELECT c.id, ct.cid, c.vq,
       |      row_number() OVER (PARTITION BY c.id
       |        ORDER BY ${cos("c.vq", "ct.cq")} DESC, ct.cid) AS rn
       |    FROM corpus c, cents0 ct)
       |  WHERE rn = 1),
       |assigned AS (
       |  SELECT id, cid0 AS cid, vq FROM a1 WHERE cid0 <> $hot
       |  UNION ALL
       |  SELECT id, cid, vq FROM (
       |    SELECT a.id, s.cid, a.vq,
       |      row_number() OVER (PARTITION BY a.id
       |        ORDER BY ${cos("a.vq", "s.cq")} DESC, s.cid) AS rn
       |    FROM a1 a, subs s WHERE a.cid0 = $hot)
       |  WHERE rn = 1),
       |queries AS (
       |  SELECT vec_id AS qid, $quantSql AS qq
       |  FROM embeddings WHERE vec_id < 10),
       |probed AS (
       |  SELECT qid, cid, qq FROM (
       |    SELECT q.qid, ct.cid, q.qq,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${cos("q.qq", "ct.cq")} DESC, ct.cid) AS rn
       |    FROM queries q, cents2 ct)
       |  WHERE rn <= 4)
       |SELECT qid, id, cosine, rank FROM (
       |  SELECT p.qid, a.id, ${cos("p.qq", "a.vq")} AS cosine,
       |    CAST(row_number() OVER (PARTITION BY p.qid
       |      ORDER BY ${cos("p.qq", "a.vq")} DESC, a.id) AS INT) AS rank
       |  FROM probed p JOIN assigned a ON p.cid = a.cid
       |  WHERE p.qid <> a.id)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // Stride mirrors the query's k ≈ √n IVF rule IN SQL (max(40,
  // ⌊√(0.8·n)⌋)), so the oracle stays valid at ANY scale factor — a
  // literal 40 held only at the sf0.01/sf0.1 gate sizes and value-
  // mismatched the sf1 spot run.
  private val annIvfSql = ivfSqlWithCents(
    s"""SELECT vec_id AS cid, $quantSql AS cq FROM embeddings
       |WHERE vec_id % (SELECT GREATEST(40, CAST(FLOOR(SQRT(0.8 * count(*)))
       |  AS BIGINT)) FROM embeddings) = 0""".stripMargin)

  // --- dynamic trained-model mirrors -----------------------------------

  private def readCentsSidecar(p: java.nio.file.Path): Option[Seq[(Int, Seq[Long])]] =
    if (!java.nio.file.Files.exists(p)) None
    else Some(java.nio.file.Files.readString(p).split('\n').toSeq.map { l =>
      val Array(cid, vs) = l.split(':')
      cid.toInt -> vs.split(',').toSeq.map(_.toLong)
    })

  private def readCodebooks(dir: String): Option[Seq[Seq[Seq[Long]]]] = {
    val f = java.nio.file.Paths.get(scratchDir("ann_pq_model", dir),
      "codebooks.txt")
    if (!java.nio.file.Files.exists(f)) None
    else Some(java.nio.file.Files.readString(f).split('\n').toSeq
      .map(_.split(';').toSeq.map(_.split(',').toSeq.map(_.toLong))))
  }

  private def centsValuesCte(cents: Seq[(Int, Seq[Long])]): String =
    "SELECT * FROM (VALUES " + cents.map { case (cid, v) =>
      s"($cid, CAST([${v.mkString(",")}] AS BIGINT[]))"
    }.mkString(", ") + ") AS t(cid, cq)"

  private def cbValuesCte(cb: Seq[Seq[Seq[Long]]]): String =
    "SELECT * FROM (VALUES " + cb.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (v, c) =>
        s"($s, $c, CAST([${v.mkString(",")}] AS BIGINT[]))" }
    }.mkString(", ") + ") AS t(s, c, cvec)"

  /** The CTEs every PQ mirror shares: nearest-sub-centroid codes per
    * corpus vector (ties to the lowest code, like pqEncode) and the
    * reconstructed self-norm per vector. All integer arithmetic. */
  private def pqCodesCtes(cb: Seq[Seq[Seq[Long]]]): String = {
    val sub = cb.head.head.length
    s"""cb AS (${cbValuesCte(cb)}),
       |corpus AS (SELECT vec_id AS id, $quantSql AS vq FROM embeddings),
       |codes AS (
       |  SELECT id, s, c, cvec FROM (
       |    SELECT co.id, cb.s, cb.c, cb.cvec,
       |      row_number() OVER (PARTITION BY co.id, cb.s ORDER BY
       |        list_sum(list_transform(range(1, ${sub + 1}),
       |          i -> (co.vq[cb.s*$sub + i] - cb.cvec[i])
       |             * (co.vq[cb.s*$sub + i] - cb.cvec[i]))) ASC, cb.c ASC)
       |        AS rn
       |    FROM corpus co, cb)
       |  WHERE rn = 1),
       |selfq AS (
       |  SELECT id, SUM(list_dot_product(cvec, cvec)) AS sq
       |  FROM codes GROUP BY id),
       |queries AS (
       |  SELECT vec_id AS qid, $quantSql AS qq
       |  FROM embeddings WHERE vec_id < 10)""".stripMargin
  }

  /** Shared tail: ADC-score the candidate (qid, id) pairs, keep the
    * top-`rerank` per query by approx score, exact-rerank to top-5 —
    * the mirror of pqSearchEncoded/ivfPqSearchEncoded's serving math. */
  private def pqScoreTail(cb: Seq[Seq[Seq[Long]]], pairsCte: String,
                          rerank: Int): String = {
    val sub = cb.head.head.length
    s"""pairs AS ($pairsCte),
       |adot AS (
       |  SELECT pr.qid, pr.id,
       |    SUM(list_dot_product(
       |      list_slice(q.qq, k.s*$sub + 1, k.s*$sub + $sub), k.cvec)) AS ad
       |  FROM pairs pr JOIN queries q USING (qid)
       |  JOIN codes k ON k.id = pr.id
       |  GROUP BY pr.qid, pr.id),
       |cands AS (
       |  SELECT qid, id FROM (
       |    SELECT a.qid, a.id,
       |      row_number() OVER (PARTITION BY a.qid
       |        ORDER BY CAST(a.ad AS DOUBLE) / sqrt(CAST(s.sq AS DOUBLE))
       |          DESC, a.id) AS rn
       |    FROM adot a JOIN selfq s USING (id))
       |  WHERE rn <= $rerank),
       |scored AS (
       |  SELECT c.qid, c.id, ${cosSql("q.qq", "co.vq")} AS cosine
       |  FROM cands c JOIN queries q USING (qid)
       |  JOIN corpus co ON co.id = c.id)
       |SELECT qid, id, cosine, rank FROM (
       |  SELECT qid, id, cosine,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** Flat-PQ mirror: every corpus vector is an ADC candidate. */
  private def pqSql(cb: Seq[Seq[Seq[Long]]], rerank: Int): String =
    s"""WITH ${pqCodesCtes(cb)},
       |${pqScoreTail(cb,
      "SELECT q.qid, co.id FROM queries q, corpus co WHERE q.qid <> co.id",
      rerank)}""".stripMargin

  /** IVF-PQ mirror: candidates are corpus vectors whose assigned list
    * (nearest trained centroid) is among the query's nprobe probed
    * lists — then the same ADC + exact-rerank tail. */
  private def ivfPqSql(cb: Seq[Seq[Seq[Long]]], cents: Seq[(Int, Seq[Long])],
                       nprobe: Int, rerank: Int): String = {
    val pairs =
      s"""SELECT p.qid, a.id FROM
         |    (SELECT qid, cid FROM (
         |      SELECT q.qid, ct.cid,
         |        row_number() OVER (PARTITION BY q.qid
         |          ORDER BY ${cosSql("q.qq", "ct.cq")} DESC, ct.cid) AS rn
         |      FROM queries q, cents ct) WHERE rn <= $nprobe) p
         |  JOIN
         |    (SELECT id, cid FROM (
         |      SELECT c.id, ct.cid,
         |        row_number() OVER (PARTITION BY c.id
         |          ORDER BY ${cosSql("c.vq", "ct.cq")} DESC, ct.cid) AS rn
         |      FROM corpus c, cents ct) WHERE rn = 1) a
         |  ON p.cid = a.cid WHERE p.qid <> a.id""".stripMargin
    s"""WITH cents AS (${centsValuesCte(cents)}),
       |${pqCodesCtes(cb)},
       |${pqScoreTail(cb, pairs, rerank)}""".stripMargin
  }

  /** Static mirrors + (when the trained-model sidecars for the current
    * sf-dir exist) exact mirrors of the three trained-ANN paths with
    * the model embedded as literals. */
  def oracles: Map[String, String] = {
    val dyn: Map[String, String] = lastDir match {
      case None => Map.empty
      case Some(dir) =>
        val cb = readCodebooks(dir)
        val pqCents = readCentsSidecar(java.nio.file.Paths.get(
          scratchDir("ann_pq_model", dir), "cents.txt"))
        val kmCents = readCentsSidecar(java.nio.file.Paths.get(
          scratchDir("ann_kmeans_model", dir), "cents.txt"))
        val sdCents = readCentsSidecar(java.nio.file.Paths.get(
          scratchDir("semdedup_model", dir), "cents.txt"))
        val servedCents = readCentsSidecar(java.nio.file.Paths.get(
          scratchDir("ann_served_model", dir), "cents.txt"))
        val appendedCents = readCentsSidecar(java.nio.file.Paths.get(
          scratchDir("ann_appended_model", dir), "cents.txt"))
        // the post-append corpus: the batch perturbation (+0.05 on the
        // first double element, then quantize) is spelled with the
        // SAME IEEE double ops as the engine side
        val appendedCorpus =
          s"""SELECT vec_id AS id, $quantSql AS vq FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings)
             |      AS id,
             |    list_transform(list_concat(
             |      [list_transform(embedding, x -> CAST(x AS DOUBLE))[1]
             |         + 0.05],
             |      list_transform(embedding, x -> CAST(x AS DOUBLE))[2:len(embedding)]),
             |      x -> CAST(round(x*10000) AS BIGINT)) AS vq
             |  FROM embeddings WHERE vec_id % 10 = 0""".stripMargin
        (cb.map(c => "ann_pq_topk" -> pqSql(c, rerank = 50)) ++
          (for (c <- cb; ce <- pqCents)
            yield "ann_ivfpq_topk" -> ivfPqSql(c, ce, nprobe = 4, rerank = 40)) ++
          kmCents.map(ce =>
            "ann_kmeans_ivf" -> ivfSqlWithCents(centsValuesCte(ce))) ++
          // same mirror as ann_kmeans_ivf over the served index's own
          // sidecar: the gate asserts served-from-disk == recomputed
          servedCents.map(ce =>
            "ann_ivf_served" -> ivfSqlWithCents(centsValuesCte(ce))) ++
          // the SQL TVF serves the same index with the same queries, so
          // it shares ann_ivf_served's recomputed mirror verbatim
          servedCents.map(ce =>
            "ann_topk_sql" -> ivfSqlWithCents(centsValuesCte(ce))) ++
          // IVF-pooled MMR over the same served index: pool mirror =
          // the served probe ranked to 20, then ann_mmr's greedy CTEs
          servedCents.map(ce =>
            "ann_mmr_ivf" -> mmrIvfSql(centsValuesCte(ce))) ++
          // served-after-append == recomputed-over-union: the mirror
          // re-derives every assignment (base AND batch) from the
          // sidecar centroids over the union corpus
          appendedCents.map(ce =>
            "ann_ivf_appended" -> ivfSqlWithCents(centsValuesCte(ce),
              appendedCorpus)) ++
          // two-stage sticky mirror over the same union corpus
          (for {
            orig <- readCentsSidecar(java.nio.file.Paths.get(
              scratchDir("ann_rebalanced_model", dir), "cents.txt"))
            subs <- readCentsSidecar(java.nio.file.Paths.get(
              scratchDir("ann_rebalanced_model", dir), "subs.txt"))
            hotF = java.nio.file.Paths.get(
              scratchDir("ann_rebalanced_model", dir), "rebalance.txt")
            if java.nio.file.Files.exists(hotF)
            hot = java.nio.file.Files.readString(hotF).trim.toInt
          } yield "ann_ivf_rebalanced" ->
            ivfRebalancedSql(orig, subs, hot, appendedCorpus)) ++
          // the streamed index's final state is batching-insensitive:
          // the mirror is the plain trained-centroid search over the
          // whole (default) corpus
          readCentsSidecar(java.nio.file.Paths.get(
            scratchDir("ann_stream_model", dir), "cents.txt")).map(ce =>
            "ann_ivf_stream_ingest" -> ivfSqlWithCents(centsValuesCte(ce))) ++
          sdCents.map(ce =>
            "dedup_semantic" -> semDedupSql(centsValuesCte(ce)))).toMap
    }
    checked(
      "ann_topk" -> annTopkSql,
      "ann_mmr" -> mmrSql,
      "ann_hard_negatives" -> annHardNegSql,
      // exact pruning ⇒ the IVF-pruned range search must reproduce the
      // brute-force answer row-for-row; sharing the mirror makes the
      // gate assert exactly that (lost rows OR duplicated list
      // membership both go red)
      "ann_ivf_range" ->
        s"""WITH q AS (
           |  SELECT vec_id AS qid, $quantSql AS qq
           |  FROM embeddings WHERE vec_id < 10),
           |c AS (SELECT vec_id AS id, $quantSql AS cq FROM embeddings)
           |SELECT qid, id, cosine FROM (
           |  SELECT qid, id, ${cosSql("qq", "cq")} AS cosine
           |  FROM q, c WHERE qid <> id)
           |WHERE cosine >= 0.3 ORDER BY qid, id""".stripMargin,
      "ann_range_search" ->
        s"""WITH q AS (
           |  SELECT vec_id AS qid, $quantSql AS qq
           |  FROM embeddings WHERE vec_id < 10),
           |c AS (SELECT vec_id AS id, $quantSql AS cq FROM embeddings)
           |SELECT qid, id, cosine FROM (
           |  SELECT qid, id, ${cosSql("qq", "cq")} AS cosine
           |  FROM q, c WHERE qid <> id)
           |WHERE cosine >= 0.3 ORDER BY qid, id""".stripMargin,
      "ann_ivf_topk" -> annIvfSql,
      "ann_lsh_neardup" -> annLshSql
    ) ++ dyn
  }
}
