package graft.connector

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._

/** Persisted per-file / per-row-group statistics manifest
  * (`<table>/_kvstats.json`) for the V2 planner.
  *
  * Motivation (100 TB): `planInputPartitions` must not open parquet
  * footers on the driver — at 10^5 files that serializes 10^5 reads into
  * query planning. The reference avoided the same trap by fetching
  * region metadata once from the master (`TableInputFormatWrap.java:46`);
  * here the stats are persisted AT WRITE TIME (V2 writer tasks extract
  * their own file's stats and ship them in the commit message — zero
  * driver footer IO; the v1 parquet path back-fills incrementally,
  * reading only footers of files not yet in the manifest) and planning
  * reads ONE small JSON file.
  *
  * Entries carry: relative path, file length (stale detection), and per
  * row group: byte range (for row-group-level splits), row count, and
  * per-column min/max (for range/point pruning without footer IO).
  */
object KvStats {

  /** Column min/max, values encoded as strings with a type tag:
    * `s` string, `l` long/int, `d` double/float. */
  final case class ColStat(t: String, mn: String, mx: String)

  /** One parquet row group: `[start, start+len)` is the byte range whose
    * midpoint selects exactly this group via `ParquetReader.withFileRange`
    * (parquet filters blocks by `startingPos + compressedSize/2`). */
  final case class GroupStat(start: Long, len: Long, rows: Long,
                             stats: Map[String, ColStat])

  /** `path` is relative to the table root (tables stay relocatable). */
  final case class FileStat(path: String, len: Long, groups: Seq[GroupStat])

  /** `schema` is the parquet MessageType of the data files, so projection
    * and inference need no footer either. */
  final case class Manifest(schema: String, files: Seq[FileStat])

  def statsFile(path: String) = s"$path/_kvstats.json"

  private val mapper = new ObjectMapper()

  // ---- footer extraction (the only place stats are computed) ----

  /** Extract a [[FileStat]] from a file's parquet footer. Called by V2
    * writer TASKS on their own output and by the v1 back-fill for new
    * files only. */
  def fromFooter(file: HPath, relPath: String, len: Long,
                 conf: Configuration): FileStat = {
    KvV2Util.footerOpens.incrementAndGet()
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val groups = reader.getFooter.getBlocks.asScala.toSeq.map { b =>
        val cols = b.getColumns.asScala.flatMap { cc =>
          val s = cc.getStatistics
          if (s == null || !s.hasNonNullValue) None
          else {
            val name = cc.getPath.toDotString
            (s.genericGetMin, s.genericGetMax) match {
              case (mn: Binary, mx: Binary)
                if cc.getPrimitiveType.getLogicalTypeAnnotation.isInstanceOf[
                  org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                Some(name -> ColStat("s", mn.toStringUsingUTF8, mx.toStringUsingUTF8))
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                Some(name -> ColStat("l", mn.toString, mx.toString))
              case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                Some(name -> ColStat("l", mn.toString, mx.toString))
              case (mn: java.lang.Double, mx: java.lang.Double) =>
                Some(name -> ColStat("d", mn.toString, mx.toString))
              case (mn: java.lang.Float, mx: java.lang.Float) =>
                Some(name -> ColStat("d", mn.toString, mx.toString))
              case _ => None // binary/boolean: not used for pruning
            }
          }
        }.toMap
        GroupStat(b.getStartingPos, b.getCompressedSize, b.getRowCount, cols)
      }
      FileStat(relPath, len, groups)
    } finally reader.close()
  }

  // ---- pruning against manifest stats (no IO) ----

  /** True unless a pushed filter provably excludes the whole row group.
    * Columns absent from the stats can never prune (safe default). */
  def groupPasses(stats: Map[String, ColStat], pushed: Array[Filter]): Boolean =
    pushed.forall { f =>
      val (colName, check) = bound(f)
      stats.get(colName).forall(cs => check(cs))
    }

  private def cmp(cs: ColStat, side: String, v: Any): Int = {
    val raw = if (side == "mn") cs.mn else cs.mx
    (cs.t, v) match {
      case ("s", s: String) => cmpBytes(raw.getBytes("UTF-8"), s.getBytes("UTF-8"))
      case ("l", l: Long) => java.lang.Long.compare(raw.toLong, l)
      case ("l", i: Integer) => java.lang.Long.compare(raw.toLong, i.toLong)
      case ("d", d: Double) => java.lang.Double.compare(raw.toDouble, d)
      case _ => 0 // type mismatch -> treat as overlapping, never prune
    }
  }

  /** Unsigned lexicographic byte order — parquet's BINARY stats order. */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def bound(f: Filter): (String, ColStat => Boolean) = f match {
    case GreaterThan(c, v) => (c, cs => cmp(cs, "mx", v) > 0)
    case GreaterThanOrEqual(c, v) => (c, cs => cmp(cs, "mx", v) >= 0)
    case LessThan(c, v) => (c, cs => cmp(cs, "mn", v) < 0)
    case LessThanOrEqual(c, v) => (c, cs => cmp(cs, "mn", v) <= 0)
    case EqualTo(c, v) => (c, cs => cmp(cs, "mn", v) <= 0 && cmp(cs, "mx", v) >= 0)
    case other => (other.references.headOption.getOrElse(""), _ => true)
  }

  // ---- manifest IO ----

  def read(path: String, conf: Configuration): Option[Manifest] = {
    val f = new HPath(statsFile(path))
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      try Some(parse(mapper.readTree(s)))
      catch { case _: Exception => None } // corrupt manifest -> footer fallback
    }
  }

  private def parse(root: JsonNode): Manifest = {
    val files = root.get("files").elements().asScala.map { fn =>
      val groups = fn.get("groups").elements().asScala.map { gn =>
        val stats = Option(gn.get("stats")).map { sn =>
          sn.properties().asScala.map { e =>
            val v = e.getValue
            e.getKey -> ColStat(v.get("t").asText(),
              v.get("mn").asText(), v.get("mx").asText())
          }.toMap
        }.getOrElse(Map.empty[String, ColStat])
        GroupStat(gn.get("start").asLong(), gn.get("len").asLong(),
          gn.get("rows").asLong(), stats)
      }.toSeq
      FileStat(fn.get("path").asText(), fn.get("len").asLong(), groups)
    }.toSeq
    Manifest(Option(root.get("schema")).map(_.asText()).getOrElse(""), files)
  }

  def write(path: String, m: Manifest, conf: Configuration): Unit = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("schema", m.schema)
    val filesArr: ArrayNode = root.putArray("files")
    m.files.foreach { f =>
      val fn = filesArr.addObject()
      fn.put("path", f.path)
      fn.put("len", f.len)
      val groupsArr = fn.putArray("groups")
      f.groups.foreach { g =>
        val gn = groupsArr.addObject()
        gn.put("start", g.start)
        gn.put("len", g.len)
        gn.put("rows", g.rows)
        val sn = gn.putObject("stats")
        g.stats.foreach { case (name, cs) =>
          val cn = sn.putObject(name)
          cn.put("t", cs.t); cn.put("mn", cs.mn); cn.put("mx", cs.mx)
        }
      }
    }
    val f = new HPath(statsFile(path))
    val fs = f.getFileSystem(conf)
    val out = fs.create(f, true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
  }

  /** Path of `file` relative to the table root (both made qualified). */
  def relativize(tablePath: String, file: HPath, conf: Configuration): String = {
    val fs = new HPath(tablePath).getFileSystem(conf)
    val root = fs.makeQualified(new HPath(tablePath)).toString
    val full = fs.makeQualified(file).toString
    if (full.startsWith(root)) full.substring(root.length).stripPrefix("/")
    else full
  }

  /** Incremental back-fill for files written OUTSIDE the V2 writer (the
    * v1 parquet append path and compaction): reads footers only for
    * files not already present (or changed length), drops entries for
    * deleted files.
    *
    * Cost note (deliberate): each call lists the data dir, footer-reads
    * only the NEW files, and rewrites the manifest whole — O(total
    * files) JSON per append. That is the v1-path convenience trade; the
    * V2 commit path extracts stats task-side and pays the same
    * whole-manifest rewrite. For append-heavy 10^5-file tables the next
    * step is a segmented manifest (one segment per commit, compacted
    * with the table), which this format can adopt without changing
    * readers' view. High-frequency small appenders (streaming
    * foreachBatch) amortize by compacting periodically. */
  def refresh(path: String, conf: Configuration): Unit = {
    val files = KvV2Util.dataFiles(path, conf)
    val prior = read(path, conf)
    val existing: Map[String, FileStat] =
      prior.map(_.files.map(f => f.path -> f).toMap).getOrElse(Map.empty)
    val schemaStr = prior.map(_.schema).filter(_.nonEmpty)
      .orElse(files.headOption.map(f => KvV2Util.footerSchema(f, conf).toString))
      .getOrElse("")
    val entries = files.map { f =>
      val rel = relativize(path, f.getPath, conf)
      existing.get(rel).filter(_.len == f.getLen)
        .getOrElse(fromFooter(f.getPath, rel, f.getLen, conf))
    }
    write(path, Manifest(schemaStr, entries), conf)
  }
}
