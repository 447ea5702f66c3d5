package graft

import java.nio.file.{Files, LinkOption, NoSuchFileException, Paths}
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}

import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem whose file-status loading goes through java.nio
  * instead of the per-file `ls -ld` SHELL EXEC Hadoop's
  * RawLocalFileSystem falls back to when the native library is absent
  * (this sandbox has no libhadoop, like many container deployments).
  * Measured on this host: `listFiles(recursive)` over a 1 440-entry
  * tree = 9.8–16.6 s through stock Hadoop vs 0.03–0.05 s through
  * java.nio — ~7–11 MILLISECONDS of process-fork overhead per file
  * status. Every index-lifecycle operation pays that path per file:
  * segment listing for commit stamps, the output committer's task-dir
  * merges, partition discovery on every bucket/cell table read, and
  * GC — on a 252-bucket LSH segment that is seconds of pure metadata
  * forks per commit, which profiling showed dominating the lifecycle
  * families (the Spark jobs inside the same entries sum to a third of
  * their wall time).
  *
  * Semantics are identical to stock Hadoop: length, directory flag,
  * mtime/atime, owner, group and permission bits come from the same
  * inodes via PosixFileAttributes (symlinks followed, like the shell
  * path); the checksum wrapper below keeps LocalFileSystem's CRC
  * sidecar behavior byte-for-byte. On a real cluster with native IO
  * the stock path is already fast — this class restores the intended
  * local performance, it does not change what is computed. Registered
  * through `fs.file.impl` in [[Tuning]]. */
class FastRawLocalFileSystem extends RawLocalFileSystem {

  private val permBits: Array[(PosixFilePermission, Int)] = Array(
    PosixFilePermission.OWNER_READ -> 0x100,
    PosixFilePermission.OWNER_WRITE -> 0x80,
    PosixFilePermission.OWNER_EXECUTE -> 0x40,
    PosixFilePermission.GROUP_READ -> 0x20,
    PosixFilePermission.GROUP_WRITE -> 0x10,
    PosixFilePermission.GROUP_EXECUTE -> 0x8,
    PosixFilePermission.OTHERS_READ -> 0x4,
    PosixFilePermission.OTHERS_WRITE -> 0x2,
    PosixFilePermission.OTHERS_EXECUTE -> 0x1)

  private def statusOf(f: Path): FileStatus = {
    val file = pathToFile(f)
    val attrs =
      try Files.readAttributes(file.toPath, classOf[PosixFileAttributes])
      catch {
        case _: NoSuchFileException =>
          throw new java.io.FileNotFoundException(
            s"File $f does not exist")
      }
    val perms = attrs.permissions()
    var bits = 0
    permBits.foreach { case (p, b) => if (perms.contains(p)) bits |= b }
    new FileStatus(attrs.size(), attrs.isDirectory, 1,
      getDefaultBlockSize(f), attrs.lastModifiedTime().toMillis,
      attrs.lastAccessTime().toMillis, new FsPermission(bits),
      attrs.owner().getName, attrs.group().getName,
      makeQualified(f))
  }

  override def getFileStatus(f: Path): FileStatus = statusOf(f)

  override def listStatus(f: Path): Array[FileStatus] = {
    val file = pathToFile(f)
    val nio = file.toPath
    val base =
      try Files.readAttributes(nio, classOf[PosixFileAttributes])
      catch {
        case _: NoSuchFileException =>
          throw new java.io.FileNotFoundException(
            s"File $f does not exist")
      }
    if (!base.isDirectory) return Array(statusOf(f))
    val out = Array.newBuilder[FileStatus]
    val stream = Files.newDirectoryStream(nio)
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val child = it.next()
        try out += statusOf(new Path(f, child.getFileName.toString))
        catch { case _: java.io.FileNotFoundException => () } // raced away
      }
    } finally stream.close()
    out.result()
  }
}

/** The checksummed `file://` wrapper (CRC sidecars, like stock
  * LocalFileSystem) over [[FastRawLocalFileSystem]]. */
class FastLocalFileSystem
    extends LocalFileSystem(new FastRawLocalFileSystem)
