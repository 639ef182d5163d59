package graft.hadoop

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import java.io.FileNotFoundException
import java.nio.file.{Files, NoSuchFileException}
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}
import scala.jdk.CollectionConverters._

/** Local `file://` FileSystem with java.nio metadata operations.
  *
  * Without the native-hadoop library, `RawLocalFileSystem` falls back
  * to fork+exec for permission work: every `create()` shells out
  * `chmod`, and every `FileStatus.getPermission` (hit by Spark's
  * file-index when it wraps statuses into `LocatedFileStatus`) shells
  * out `ls -ld` — ~5 ms of process fork per file. A partitioned write
  * producing hundreds of small files spends more time forking than
  * writing. This subclass answers the same contracts through one
  * readAttributes syscall per file and never execs.
  *
  * Local-mode plumbing only: benches/tests install it via
  * `spark.hadoop.fs.file.impl`. Cluster deployments talk to HDFS/S3,
  * where none of this applies. Checksum sidecars are intentionally
  * dropped (RawLocalFileSystem semantics): parquet/avro carry their
  * own page/block CRCs.
  */
class FastLocalFileSystem extends RawLocalFileSystem {

  private def toFsPermission(perms: java.util.Set[PosixFilePermission]): FsPermission = {
    import PosixFilePermission._
    var mode = 0
    def bit(p: PosixFilePermission, b: Int): Unit = if (perms.contains(p)) mode |= b
    bit(OWNER_READ, 0x100); bit(OWNER_WRITE, 0x80); bit(OWNER_EXECUTE, 0x40)
    bit(GROUP_READ, 0x20); bit(GROUP_WRITE, 0x10); bit(GROUP_EXECUTE, 0x8)
    bit(OTHERS_READ, 0x4); bit(OTHERS_WRITE, 0x2); bit(OTHERS_EXECUTE, 0x1)
    new FsPermission(mode.toShort)
  }

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    // build the set from the mode BITS — FsPermission.toString renders
    // a sticky bit as 't'/'T', which PosixFilePermissions.fromString
    // rejects (NIO has no sticky-bit notion; it is dropped, as
    // RawLocalFileSystem's non-native fallback effectively did too)
    import PosixFilePermission._
    val mode = permission.toShort
    val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    def bit(b: Int, perm: PosixFilePermission): Unit =
      if ((mode & b) != 0) { set.add(perm); () }
    bit(0x100, OWNER_READ); bit(0x80, OWNER_WRITE); bit(0x40, OWNER_EXECUTE)
    bit(0x20, GROUP_READ); bit(0x10, GROUP_WRITE); bit(0x8, GROUP_EXECUTE)
    bit(0x4, OTHERS_READ); bit(0x2, OTHERS_WRITE); bit(0x1, OTHERS_EXECUTE)
    Files.setPosixFilePermissions(pathToFile(p).toPath, set)
  }

  private def status(p: Path, nio: java.nio.file.Path): FileStatus = {
    val attrs = Files.readAttributes(nio, classOf[PosixFileAttributes])
    new FileStatus(attrs.size(), attrs.isDirectory, 1, getDefaultBlockSize(p),
      attrs.lastModifiedTime().toMillis, attrs.lastAccessTime().toMillis,
      toFsPermission(attrs.permissions()), attrs.owner().getName,
      attrs.group().getName, null, makeQualified(p))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val nio = pathToFile(f).toPath
    try status(f, nio)
    catch { case _: NoSuchFileException | _: FileNotFoundException =>
      throw new FileNotFoundException(s"File $f does not exist")
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val dir = pathToFile(f).toPath
    if (!Files.exists(dir))
      throw new FileNotFoundException(s"File $f does not exist")
    if (!Files.isDirectory(dir)) return Array(getFileStatus(f))
    val out = scala.collection.mutable.ArrayBuffer[FileStatus]()
    val stream = Files.newDirectoryStream(dir)
    try stream.iterator().asScala.foreach { child =>
      // 3-arg Path treats the name as a raw component; Path(String)
      // would URI-parse it, misreading a literal ':' in a filename as
      // a scheme (same guard as RawLocalFileSystem.listStatus)
      val childPath = new Path(makeQualified(f),
        new Path(null, null, child.getFileName.toString))
      try out += status(childPath, child)
      catch { case _: NoSuchFileException => } // raced deletion
    } finally stream.close()
    out.toArray
  }
}
