package org.apache.spark.sql.execution.streaming.checkpointing

import java.io.FileNotFoundException
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, NoSuchFileException, Path => JPath, Paths, StandardCopyOption, StandardOpenOption}
import java.util.Comparator

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, FSDataOutputStream, FSInputStream, Path, PathFilter}

import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Local-filesystem [[CheckpointFileManager]] over `java.nio.file` —
  * the round-17 fix for the streaming family's serialized fork storm.
  *
  * The measured pathology (sf0.1 `streaming_event_pairs`: 167 task-
  * SECONDS of run time against 12 CPU-seconds; a thread dump caught
  * 31/32 task threads queued on the global
  * `StateStore.loadedProviders` lock behind ONE thread inside
  * `hadoop.util.Shell.runCommand`): without the Hadoop native library
  * — the normal state of a local[*] deployment — every permissioned
  * create/mkdir on Hadoop's local filesystems FORKS a `chmod` child
  * process, and the checksummed default (`LocalFileSystem`) doubles
  * the file count with `.crc` siblings. A stream-stream join opens 4
  * state stores × partitions, each init mkdir-ing its provider dir
  * UNDER the global provider lock, and every micro-batch commit
  * writes a delta file per store through the same fork path: a
  * fresh-checkpoint query pays seconds of serialized process-spawning
  * that is neither compute nor I/O.
  *
  * This manager does exactly what the checkpoint contract needs on a
  * local filesystem and nothing else: plain-syscall streams, POSIX
  * atomic rename for `createAtomic` (rename IS the atomicity
  * guarantee the default manager gets from the same syscall, minus
  * the permission forks and checksum siblings), and
  * `FileNotFoundException` signatures matching Hadoop's so
  * `HDFSMetadataLog`/state-store callers see identical semantics.
  * Wired by [[graft.streaming.StreamingPipeline.enableNioCheckpoints]]
  * via `spark.sql.streaming.checkpointFileManagerClass` — a LOCAL-FS
  * choice: deployments checkpointing to HDFS/S3 keep the default
  * manager (this class refuses non-local schemes loudly).
  */
class NioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  private def jpath(p: Path): JPath = {
    val uri = p.toUri
    val scheme = uri.getScheme
    require(scheme == null || scheme == "file",
      s"NioCheckpointFileManager is local-only; got $p — unset " +
        "spark.sql.streaming.checkpointFileManagerClass for remote checkpoints")
    Paths.get(uri.getPath)
  }

  private def status(f: JPath): FileStatus = {
    val abs = f.toAbsolutePath
    val isDir = Files.isDirectory(abs)
    val len = if (isDir) 0L else Files.size(abs)
    val mtime = Files.getLastModifiedTime(abs).toMillis
    new FileStatus(len, isDir, 1, 33554432L, mtime, new Path(abs.toUri))
  }

  /** Write-to-temp + POSIX atomic rename — the same contract the
    * default manager's RenameBasedFSDataOutputStream provides
    * (RenameHelperMethods is sealed, so the stream is inlined here):
    * `close()` publishes atomically, `cancel()` drops the temp file,
    * and a non-overwrite rename onto an existing destination raises
    * Hadoop's FileAlreadyExistsException after discarding the temp.
    */
  override def createAtomic(
      path: Path, overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val dst = jpath(path)
    val parent = dst.toAbsolutePath.getParent
    if (parent != null) Files.createDirectories(parent)
    val tmp = parent.resolve(s".${dst.getFileName}.${java.util.UUID.randomUUID}.tmp")
    val raw = Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW,
      StandardOpenOption.WRITE)
    new CancellableFSDataOutputStream(raw) {
      private var terminated = false
      override def cancel(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          try raw.close() finally Files.deleteIfExists(tmp)
        }
      }
      override def close(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          // flush the FSDataOutputStream position cache, then the raw
          // stream (super.close closes the whole wrapper chain)
          super.close()
          if (!overwriteIfPossible && Files.exists(dst)) {
            Files.deleteIfExists(tmp)
            throw new FileAlreadyExistsException(
              s"Failed to rename $tmp to $path as destination already exists")
          }
          try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: NoSuchFileException if Files.exists(dst) =>
              // lost a benign rename race (both writers produce the
              // same content) — the default manager's tolerance
              Files.deleteIfExists(tmp)
          }
        }
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    val ch =
      try FileChannel.open(jpath(path), StandardOpenOption.READ)
      catch {
        case e: NoSuchFileException =>
          throw new FileNotFoundException(e.getMessage)
      }
    new FSDataInputStream(new FSInputStream {
      override def seek(pos: Long): Unit = ch.position(pos)
      override def getPos: Long = ch.position()
      override def seekToNewSource(targetPos: Long): Boolean = false
      override def read(): Int = {
        val b = ByteBuffer.allocate(1)
        if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        ch.read(ByteBuffer.wrap(b, off, len))
      override def available(): Int =
        math.min(math.max(ch.size() - ch.position(), 0L), Int.MaxValue.toLong).toInt
      override def close(): Unit = ch.close()
    })
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val p = jpath(path)
    if (!Files.exists(p))
      throw new FileNotFoundException(s"File $path does not exist")
    val all =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.toArray(n => new Array[JPath](n)) finally s.close()
      } else Array(p)
    all.map(status).filter(st => filter.accept(st.getPath))
  }

  override def mkdirs(path: Path): Unit =
    Files.createDirectories(jpath(path))

  override def exists(path: Path): Boolean = Files.exists(jpath(path))

  override def delete(path: Path): Unit = {
    val p = jpath(path)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    val abs = jpath(root).toAbsolutePath
    Files.createDirectories(abs)
    new Path(abs.toUri)
  }
}
