package graft.connector

import java.net.URI

import org.apache.hadoop.fs.{BlockLocation, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A local filesystem that reports FAKE datanode hosts for every file —
  * the stand-in for HDFS/HBase block placement that the sandbox can't
  * provide. Registered under the `stubloc://` scheme via the
  * test-classpath `core-site.xml`, so a KvTable written to a plain
  * local path can be re-read through `stubloc:<same path>` and every
  * `FileSystem.get` in the planning path resolves to this class.
  *
  * Host assignment is deterministic per file (hash of the file name
  * over a 4-node pool, 2 "replicas"), so the spec can recompute the
  * expected hosts independently. Mirrors what the reference derives
  * from region locations (reference `TableInputFormatWrap.java:74-78`,
  * `TableSplitWrap.java:7-17`) — there per HBase region, here per
  * file/block, which is the unit Spark schedules on.
  */
class StubLocFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "stubloc"
  override def getUri: URI = URI.create("stubloc:///")

  override def getFileBlockLocations(
      file: FileStatus, start: Long, len: Long): Array[BlockLocation] = {
    val hosts = StubLocFileSystem.hostsFor(file.getPath)
    Array(new BlockLocation(hosts.map(h => s"$h:9866"), hosts, 0, file.getLen))
  }

  // RawLocalFileSystem's lazy permission loader builds `new File(uri)`
  // from the status path, which rejects any scheme but file:. Return
  // statuses with permissions already materialized so listing under
  // stubloc:// never triggers it.
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, 1, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "test", "test", s.getPath)
}

object StubLocFileSystem {
  val pool: Vector[String] =
    Vector("dn-a.example", "dn-b.example", "dn-c.example", "dn-d.example")

  /** Two deterministic "replica" hosts per file name. */
  def hostsFor(p: Path): Array[String] = {
    val h = math.abs(p.getName.hashCode) % pool.size
    Array(pool(h), pool((h + 1) % pool.size))
  }
}
