package graft.delta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Version-collision conflict on commit (reference: commit failure in
  * DeltaTransaction::Commit, src/storage/delta_transaction.cpp:464-488). */
class CommitConflictException(msg: String) extends RuntimeException(msg)

/**
 * Atomic PUT-if-absent for log commit files.
 *
 * Local filesystem: write a temp file, then hard-link it to the target —
 * `Files.createLink` fails atomically with FileAlreadyExistsException if a
 * concurrent writer won the version, giving real mutual exclusion (the
 * kernel's `ffi::commit` provides the same guarantee for the reference,
 * delta_transaction.cpp:464-473). Non-local filesystems fall back to
 * create-no-overwrite, atomic on HDFS; object stores would need a
 * conditional-PUT LogStore implementation.
 */
object LogStore {

  def write(fs: FileSystem, target: Path, content: String): Unit = {
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    if ("file".equals(Option(target.toUri.getScheme).getOrElse("file"))) {
      val targetNio = Paths.get(target.toUri.getPath)
      Files.createDirectories(targetNio.getParent)
      val tmp = targetNio.getParent.resolve(s".tmp-${java.util.UUID.randomUUID}")
      Files.write(tmp, bytes)
      try {
        Files.createLink(targetNio, tmp)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new CommitConflictException(s"Version file already exists: $target")
      } finally Files.deleteIfExists(tmp)
    } else {
      if (fs.exists(target))
        throw new CommitConflictException(s"Version file already exists: $target")
      val out = fs.create(target, false)
      try out.write(bytes) finally out.close()
    }
  }

  /** Overwrite-allowed small-file write (for `_last_checkpoint`). */
  def overwrite(fs: FileSystem, target: Path, content: String): Unit = {
    val out = fs.create(target, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
