package graft.util

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Per-corpus derived indexes (co-order edges, MinHash signatures,
  * verified LSH candidates, kNN graph) materialized once per process
  * to scratch parquet.
  *
  * The scratch root is PER-JVM (pid-scoped, removed by a shutdown
  * hook): a shared deterministic path would let one process read an
  * index a different process built — corrupting scans when the other
  * process rebuilds (the old Overwrite hazard), silently reusing
  * stale indexes if the corpus is regenerated in place, and letting
  * a benchmark skip build costs it should be paying. Within the
  * process, builders write to a UNIQUE temp directory and atomically
  * rename into the final path, so the final directory is only ever
  * absent or complete and concurrent builders race the rename — the
  * loser discards its copy and reads the winner's.
  */
object ScratchIndex {

  private lazy val root: File = {
    val dir = new File(
      System.getProperty("java.io.tmpdir"),
      s"graft_scratch_${ProcessHandle.current().pid()}")
    dir.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(dir)))
    dir
  }

  def materialize(s: SparkSession, key: String)(build: => DataFrame)
      : DataFrame = {
    val dst = new File(root, key)
    if (!dst.exists()) {
      val tmp = new File(root,
        s"$key.build_${java.util.UUID.randomUUID().toString.take(8)}")
      build.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      try Files.move(tmp.toPath, dst.toPath,
        StandardCopyOption.ATOMIC_MOVE): Unit
      catch {
        case _: java.nio.file.FileSystemException =>
          deleteRecursively(tmp) // another builder won the rename
      }
    }
    s.read.parquet(dst.toString)
  }

  /** Like `materialize`, but the builder controls the write (e.g. a
    * hive-partitioned `partitionBy` layout a plain parquet dump can't
    * express). The callback writes into a unique temp dir which is
    * atomically renamed into place; returns the final path.
    */
  def materializePath(s: SparkSession, key: String)(write: String => Unit)
      : String = {
    val dst = new File(root, key)
    if (!dst.exists()) {
      val tmp = new File(root,
        s"$key.build_${java.util.UUID.randomUUID().toString.take(8)}")
      write(tmp.toString)
      try Files.move(tmp.toPath, dst.toPath,
        StandardCopyOption.ATOMIC_MOVE): Unit
      catch {
        case _: java.nio.file.FileSystemException =>
          deleteRecursively(tmp) // another builder won the rename
      }
    }
    dst.toString
  }

  /** A named scratch directory under the pid-scoped root, for callers
    * that manage their own file layout (streaming checkpoints/sinks).
    * Pid-scoping matters because those callers typically START by
    * recursively deleting the directory — a path shared across JVMs
    * would let two concurrent harnesses delete each other's in-flight
    * state. Cleaned up by the same shutdown hook as the indexes.
    */
  def dir(key: String): File = new File(root, key)

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
