package graft.util

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without permission management — the engine's
  * `file:` scheme implementation for hosts WITHOUT the Hadoop native
  * library (this sandbox has no libhadoop.so).
  *
  * Why: without NativeIO, `RawLocalFileSystem.setPermission` shells
  * out to `chmod` — and `createOutputStreamWithMode` /
  * `mkOneDirWithMode` call it for EVERY created file and directory,
  * so every parquet part file, checksum `.crc`, streaming-checkpoint
  * WAL entry and state-store delta pays a process fork+exec on the
  * write path (observed directly via jstack during the
  * stream_lsh_index micro-batches: `Shell.runCommand` →
  * `ProcessImpl.forkAndExec`). Likewise
  * `DeprecatedRawLocalFileStatus.loadPermissionInfo` forks `ls` when
  * a listed status's permission is first read. None of these
  * permissions carry meaning for per-JVM scratch, bench sinks or
  * read-only testdata, so both paths are overridden to no-ops: chmod
  * is skipped outright, and file statuses report the default
  * permission without the lazy shell probe.
  *
  * Semantics: identical bytes in, identical bytes out — only the
  * POSIX permission side-channel is dropped, exactly what the
  * in-JVM NativeIO fast path would have made nearly free.
  */
class BareLocalFileSystem extends LocalFileSystem(new BareRawLocalFileSystem)

/** `file:` AbstractFileSystem (the FileContext API — what Spark's
  * streaming-checkpoint WAL writes go through) over the no-fork raw
  * FS. Mirrors hadoop's own LocalFs = ChecksumFs(RawLocalFs(raw)).
  */
class BareLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.ChecksumFs(new BareRawLocalFs(uri, conf))

class BareRawLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new BareRawLocalFileSystem, conf, "file", false) {
  override def getUriDefaultPort: Int = -1
}

/** RawLocalFileSystem whose permission operations never fork. */
class BareRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  // listed/stat'ed files report the default permission instead of
  // lazily forking `ls -ld` (loadPermissionInfoByNonNativeIO) the
  // first time permission/owner is read from a status
  private def noPerm(st: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getAccessTime, FsPermission.getDefault, "", "", st.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    noPerm(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(noPerm)
}
