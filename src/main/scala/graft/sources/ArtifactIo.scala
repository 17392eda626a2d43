package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, Options, Path => HPath}

/** Filesystem primitives for the artifact machinery (sketch fragments,
  * scored/positional index appends, totals sidecars, marker files, append
  * locks) behind ONE seam, so the artifact layer runs against either the
  * local filesystem (`java.nio`, the historical contract) or a Hadoop
  * `FileSystem` (`hdfs://`, `abfss://`, …) — the reference abstracts its
  * stores the same way (`storage.fs:37-51` keys HDD vs Azure behind
  * `StorageKind`).
  *
  * Resolution ([[ArtifactIo.forPath]]): a scheme-less path gets
  * [[LocalArtifactIo]] — byte-identical behavior to the pre-abstraction
  * code (OS advisory `FileLock`s, `ATOMIC_MOVE` renames). A scheme'd path
  * gets [[HadoopArtifactIo]] IF the scheme is on the rename-atomic
  * allowlist; anything else (s3a, gs, wasb, …) fails LOUDLY at entry —
  * the artifact commit protocol is temp-file + atomic rename and
  * create-exclusive lock files, and a store that renames by copy+delete
  * would turn every "atomic" sidecar swap into a torn-read window. Route
  * object-store ingest through [[Snapshots]] versioned tables instead
  * (the ii6 composition), whose pointer protocol is written for that.
  *
  * ONE path string must mean ONE location and ONE protocol everywhere it
  * is read: `/data/x` (LocalIo, OS locks) and `file:/data/x` (HadoopIo,
  * lock FILES) are the same directory under two different lock protocols
  * — writers must agree on the path form, exactly as they must agree on
  * the path itself. The streaming loops' path guard enforces the same
  * doctrine.
  *
  * Lock-protocol difference, stated loudly: the local impl holds an OS
  * advisory lock on a persistent inode — a crashed holder's lock releases
  * AUTOMATICALLY. The Hadoop impl acquires by atomic CREATE-EXCLUSIVE of
  * the lock file and releases by deleting it — a crashed holder LEAVES
  * the file behind, and the next writer fails loudly after the bounded
  * wait with remediation in the message (verify no live writer, delete
  * the lock file). No silent mtime-based stealing: expiry heuristics can
  * steal a live slow holder's lock, which is worse than an operator page.
  */
private[graft] sealed trait ArtifactIo {

  def exists(path: String): Boolean

  def isDirectory(path: String): Boolean

  def createDirs(path: String): Unit

  /** Create-or-truncate an empty file (marker semantics). */
  def touch(path: String): Unit

  /** Delete a file if present; idempotent. */
  def delete(path: String): Unit

  /** Recursive delete; missing path is a no-op. */
  def deleteTree(path: String): Unit

  /** Full contents, or None when the file is absent. */
  def readBytes(path: String): Option[Array[Byte]]

  /** Publish `bytes` at `path` atomically (same-directory temp + atomic
    * rename-with-replace): a reader sees the old contents or the new,
    * never a torn write.
    */
  def writeAtomic(path: String, bytes: Array[Byte]): Unit

  /** Atomic move, destination must not exist (file or directory — the
    * compact swap's primitive).
    */
  def rename(src: String, dst: String): Unit

  /** Plain create-or-truncate write (NOT atomic — pair with
    * [[renameReplace]] for the temp-then-publish protocol when the temp
    * name matters to a debris sweep; use [[writeAtomic]] otherwise).
    */
  def writeFile(path: String, bytes: Array[Byte]): Unit

  /** Atomic move that REPLACES an existing destination (the pointer
    * publish primitive).
    */
  def renameReplace(src: String, dst: String): Unit

  /** Atomic no-replace move returning `false` when the destination
    * already exists (the version-claim primitive — the caller advances
    * and retries).
    */
  def tryRenameNoReplace(src: String, dst: String): Boolean

  /** Child names of `dir` (not paths); empty when `dir` is missing or
    * not a directory.
    */
  def listNames(dir: String): Seq[String]

  /** (name, isDirectory, size) of each child of `dir`; empty when `dir`
    * is missing or not a directory (the compaction byte-accounting
    * primitive).
    */
  def listEntries(dir: String): Seq[(String, Boolean, Long)]

  /** Last-modified time of `path` in epoch ms; None when missing. */
  def mtimeMs(path: String): Option[Long]

  /** Same-store copy of one file, by hard link where the store supports
    * it (POSIX link counting keeps shared bytes alive until the last
    * name drops) and by byte copy otherwise (HDFS exposes no user-facing
    * hard links — the carry-forward cost there is O(bytes), the
    * documented deployment note).
    */
  def linkOrCopy(src: String, dst: String): Unit

  /** Reclaim staging debris: delete direct children of `dir` whose name
    * starts with `prefix` and whose ENTIRE tree has been untouched for
    * `graceMs` (a live writer keeps its leaves fresh — top-dir mtime is
    * not enough). Missing `dir` is a no-op; best-effort under races.
    */
  def sweepStale(dir: String, prefix: String, graceMs: Long): Unit

  /** Whether `dir` holds any non-`_`/`.`-prefixed entries — the "does an
    * artifact already live here" probe ([[FsUtil.hasDataFiles]]'s
    * semantics on every store).
    */
  def hasDataFiles(dir: String): Boolean

  /** Run `body` holding this store's exclusive lock on `lockPath`
    * (bounded wait, loud timeout — see the trait note for the per-store
    * protocol).
    */
  def withLock[A](lockPath: String, timeoutMs: Long, what: String,
      timeoutHint: String)(body: => A): A

  /** Non-blocking [[withLock]]: one acquisition attempt, `None` when held
    * elsewhere (callers' slow path must be safe to skip).
    */
  def tryWithLock[A](lockPath: String)(body: => A): Option[A]
}

private[graft] object ArtifactIo {

  /** Matches [[graft.streaming.ArtifactPaths]]'s scheme test: 2+ chars so
    * a Windows drive letter stays a local path.
    */
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]+):/.*".r

  /** Stores whose rename is atomic (file: delegates to the OS rename;
    * HDFS-family renames are namespace metadata ops; ABFS atomic-renames
    * on hierarchical namespaces, Ozone likewise).
    */
  private val RenameAtomicSchemes =
    Set("file", "hdfs", "viewfs", "abfs", "abfss", "ofs", "o3fs")

  /** Child-path join as a plain string suffix — valid for local paths
    * and scheme'd URIs alike (`java.nio.Paths.get` would mangle a
    * scheme). The ONE copy of the load-bearing join rule every artifact
    * family uses; a future change (e.g. a bare `scheme://host` dir)
    * lands once, never per-file.
    */
  def child(dir: String, names: String*): String =
    (dir.stripSuffix("/") +: names).mkString("/")

  def forPath(path: String): ArtifactIo = path match {
    case SchemeRe(scheme) =>
      require(RenameAtomicSchemes.contains(scheme.toLowerCase),
        s"artifact store: scheme '$scheme' ($path) is not on the rename-atomic " +
          s"allowlist ${RenameAtomicSchemes.toSeq.sorted.mkString("{", ", ", "}")} — " +
          "the artifact commit protocol needs atomic rename + create-exclusive, " +
          "which copy+delete stores (s3a, gs, wasb, …) cannot provide; route " +
          "object-store ingest through graft.sources.Snapshots versioned tables " +
          "(the ii6 composition) instead")
      new HadoopArtifactIo(hadoopConf())
    case _ => LocalArtifactIo
  }

  /** The active session's Hadoop conf when one exists (fs.* overrides,
    * kerberos, …); a bare default otherwise (tests, driver-side tools).
    */
  private def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
}

/** The historical local-filesystem behavior, verbatim: `java.nio` probes,
  * `ATOMIC_MOVE` renames, OS advisory locks on persistent inodes
  * ([[FsUtil.withFileLock]] — crashed holders release automatically).
  */
private[graft] object LocalArtifactIo extends ArtifactIo {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  def exists(path: String): Boolean = Files.exists(Paths.get(path))

  def isDirectory(path: String): Boolean = Files.isDirectory(Paths.get(path))

  def createDirs(path: String): Unit = { Files.createDirectories(Paths.get(path)): Unit }

  def touch(path: String): Unit = { Files.write(Paths.get(path), Array.emptyByteArray): Unit }

  def delete(path: String): Unit = { Files.deleteIfExists(Paths.get(path)): Unit }

  def deleteTree(path: String): Unit = FsUtil.deleteTree(Paths.get(path))

  def readBytes(path: String): Option[Array[Byte]] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None else Some(Files.readAllBytes(p))
  }

  def writeAtomic(path: String, bytes: Array[Byte]): Unit = {
    val dst = Paths.get(path)
    val dir = dst.getParent
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, "." + dst.getFileName.toString, ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, dst,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def rename(src: String, dst: String): Unit = {
    Files.move(Paths.get(src), Paths.get(dst), StandardCopyOption.ATOMIC_MOVE): Unit
  }

  def writeFile(path: String, bytes: Array[Byte]): Unit = {
    Files.write(Paths.get(path), bytes): Unit
  }

  def renameReplace(src: String, dst: String): Unit = {
    Files.move(Paths.get(src), Paths.get(dst),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def tryRenameNoReplace(src: String, dst: String): Boolean =
    try {
      Files.move(Paths.get(src), Paths.get(dst), StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      // some filesystems report the collision as a generic move failure;
      // only a collision is a retryable claim loss
      case _: java.nio.file.FileSystemException if Files.exists(Paths.get(dst)) => false
    }

  def listNames(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val it = Files.list(d)
      try {
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        it.iterator().forEachRemaining(p => buf += p.getFileName.toString)
        buf.toSeq
      } finally it.close()
    }
  }

  def listEntries(dir: String): Seq[(String, Boolean, Long)] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val it = Files.list(d)
      try {
        val buf = scala.collection.mutable.ArrayBuffer[(String, Boolean, Long)]()
        it.iterator().forEachRemaining { p =>
          val isDir = Files.isDirectory(p)
          buf += ((p.getFileName.toString, isDir, if (isDir) 0L else Files.size(p)))
        }
        buf.toSeq
      } finally it.close()
    }
  }

  def mtimeMs(path: String): Option[Long] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None else Some(Files.getLastModifiedTime(p).toMillis)
  }

  def linkOrCopy(src: String, dst: String): Unit = {
    try Files.createLink(Paths.get(dst), Paths.get(src))
    catch {
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        Files.copy(Paths.get(src), Paths.get(dst),
          StandardCopyOption.COPY_ATTRIBUTES)
    }
    ()
  }

  def sweepStale(dir: String, prefix: String, graceMs: Long): Unit =
    FsUtil.sweepStale(Paths.get(dir), prefix + "*", graceMs)

  def hasDataFiles(dir: String): Boolean = FsUtil.hasDataFiles(dir)

  def withLock[A](lockPath: String, timeoutMs: Long, what: String,
      timeoutHint: String)(body: => A): A =
    FsUtil.withFileLock(Paths.get(lockPath), timeoutMs, what, timeoutHint)(body)

  def tryWithLock[A](lockPath: String)(body: => A): Option[A] =
    FsUtil.tryWithFileLock(Paths.get(lockPath))(body)
}

/** Hadoop `FileSystem`-backed primitives for scheme'd artifact paths.
  * Renames go through [[FileContext]] (the API with first-class atomic
  * OVERWRITE rename); the lock protocol is create-exclusive + delete (see
  * the trait note — a crashed holder needs operator cleanup, stated in
  * the timeout message rather than healed by a stealable heuristic).
  */
private[graft] final class HadoopArtifactIo(conf: Configuration) extends ArtifactIo {

  private def fs(p: HPath) = p.getFileSystem(conf)

  private def fc(p: HPath) = FileContext.getFileContext(p.toUri, conf)

  /** One getFileStatus RPC, None when absent — the shared probe every
    * read primitive builds on (exists-then-stat would double the remote
    * round-trips of per-version loops AND open a delete race between
    * the two calls that the local twin doesn't have).
    */
  private def statOf(p: HPath): Option[org.apache.hadoop.fs.FileStatus] =
    try Some(fs(p).getFileStatus(p))
    catch { case _: java.io.FileNotFoundException => None }

  def exists(path: String): Boolean = statOf(new HPath(path)).isDefined

  def isDirectory(path: String): Boolean =
    statOf(new HPath(path)).exists(_.isDirectory)

  def createDirs(path: String): Unit = {
    val p = new HPath(path); fs(p).mkdirs(p): Unit
  }

  def touch(path: String): Unit = {
    val p = new HPath(path)
    fs(p).create(p, true).close()
  }

  def delete(path: String): Unit = {
    val p = new HPath(path); fs(p).delete(p, false): Unit
  }

  def deleteTree(path: String): Unit = {
    val p = new HPath(path); fs(p).delete(p, true): Unit
  }

  def readBytes(path: String): Option[Array[Byte]] = {
    val p = new HPath(path)
    statOf(p).map { st =>
      // whole-file-in-memory primitive: pointers, markers, manifests —
      // all small by design. A >=2GB file would truncate silently
      // through toInt; fail loudly instead of serving a short read.
      require(st.getLen < Int.MaxValue,
        s"artifact store: readBytes($path) is a small-metadata primitive, " +
          s"got a ${st.getLen}-byte file — not an artifact marker/manifest")
      val in = fs(p).open(p)
      try {
        val buf = new Array[Byte](st.getLen.toInt)
        in.readFully(0, buf)
        buf
      } finally in.close()
    }
  }

  def writeAtomic(path: String, bytes: Array[Byte]): Unit = {
    val dst = new HPath(path)
    val dir = dst.getParent
    val f = fs(dst)
    f.mkdirs(dir): Unit
    val tmp = new HPath(dir,
      s".${dst.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    fc(dst).rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  def rename(src: String, dst: String): Unit = {
    val d = new HPath(dst)
    fc(d).rename(new HPath(src), d, Options.Rename.NONE)
  }

  def writeFile(path: String, bytes: Array[Byte]): Unit = {
    val p = new HPath(path)
    val out = fs(p).create(p, true)
    try out.write(bytes) finally out.close()
  }

  def renameReplace(src: String, dst: String): Unit = {
    val d = new HPath(dst)
    fc(d).rename(new HPath(src), d, Options.Rename.OVERWRITE)
  }

  def tryRenameNoReplace(src: String, dst: String): Boolean = {
    val d = new HPath(dst)
    try { fc(d).rename(new HPath(src), d, Options.Rename.NONE); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException => if (fs(d).exists(d)) false else throw e
    }
  }

  def listNames(dir: String): Seq[String] = listEntries(dir).map(_._1)

  def listEntries(dir: String): Seq[(String, Boolean, Long)] = {
    val p = new HPath(dir)
    if (!statOf(p).exists(_.isDirectory)) Seq.empty
    else try fs(p).listStatus(p).map(st =>
      (st.getPath.getName, st.isDirectory, if (st.isDirectory) 0L else st.getLen)).toSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty } // deleted mid-call
  }

  def mtimeMs(path: String): Option[Long] =
    statOf(new HPath(path)).map(_.getModificationTime)

  def linkOrCopy(src: String, dst: String): Unit = {
    // no user-facing hard links on Hadoop stores — byte copy (the
    // documented carry-forward deployment cost there)
    val s = new HPath(src)
    val d = new HPath(dst)
    org.apache.hadoop.fs.FileUtil.copy(fs(s), s, fs(d), d,
      /* deleteSource = */ false, /* overwrite = */ false, conf): Unit
  }

  def sweepStale(dir: String, prefix: String, graceMs: Long): Unit = {
    val p = new HPath(dir)
    val f = fs(p)
    if (!statOf(p).exists(_.isDirectory)) return
    val cutoff = System.currentTimeMillis() - graceMs
    def newestMtime(st: org.apache.hadoop.fs.FileStatus): Long =
      if (!st.isDirectory) st.getModificationTime
      else (st.getModificationTime +:
        (try f.listStatus(st.getPath).toSeq.map(newestMtime)
         catch { case _: java.io.IOException => Seq.empty })).max
    try {
      f.listStatus(p).foreach { st =>
        if (st.getPath.getName.startsWith(prefix)) {
          try { if (newestMtime(st) < cutoff) f.delete(st.getPath, true): Unit }
          catch { case _: java.io.IOException => () }
        }
      }
    } catch { case _: java.io.IOException => () }
  }

  def hasDataFiles(dir: String): Boolean =
    listEntries(dir).exists { case (n, _, _) =>
      !n.startsWith("_") && !n.startsWith(".")
    }

  def withLock[A](lockPath: String, timeoutMs: Long, what: String,
      timeoutHint: String)(body: => A): A = {
    val p = new HPath(lockPath)
    val f = fs(p)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var acquired = false
    while (!acquired) {
      acquired = tryAcquire(f, p)
      if (!acquired) {
        if (System.nanoTime() > deadline) throw new IllegalStateException(
          s"$what: could not acquire lock $lockPath within ${timeoutMs / 1000}s — " +
            s"$timeoutHint. NOTE: on this store a CRASHED holder leaves the lock " +
            "file behind (no OS auto-release) — verify no live writer exists, " +
            "then delete the lock file to recover.")
        Thread.sleep(50)
      }
    }
    try body finally { f.delete(p, false): Unit }
  }

  def tryWithLock[A](lockPath: String)(body: => A): Option[A] = {
    val p = new HPath(lockPath)
    val f = fs(p)
    if (!tryAcquire(f, p)) None
    else try Some(body) finally { f.delete(p, false): Unit }
  }

  /** One atomic create-exclusive attempt. The holder string is for
    * operator forensics only (who/when), never for expiry decisions —
    * and it is BEST-EFFORT: once the create succeeded we own the lock,
    * and a failed info write must neither wedge the lock file behind a
    * false "contention" nor surrender an acquisition we hold.
    *
    * `file:` scheme special case: Hadoop's RawLocalFileSystem implements
    * `create(p, overwrite = false)` as a non-atomic exists-then-open (no
    * O_EXCL), so on the one local scheme the exclusive create goes
    * through `java.nio.Files.createFile` (true O_EXCL) on the local
    * path instead — real HDFS/ABFS creates are namespace-atomic and
    * take the FileSystem path.
    */
  private def tryAcquire(f: org.apache.hadoop.fs.FileSystem, p: HPath): Boolean = {
    val created =
      if (p.toUri.getScheme == "file") {
        val lp = java.nio.file.Paths.get(p.toUri.getPath)
        def createExcl(): Boolean =
          try { java.nio.file.Files.createFile(lp); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        // unlike Hadoop create(), java.nio createFile does not make
        // parent dirs — mirror that so both branches accept a
        // first-touch lock path
        try createExcl()
        catch {
          case _: java.nio.file.NoSuchFileException =>
            java.nio.file.Files.createDirectories(lp.getParent)
            createExcl()
        }
      } else
        try { f.create(p, false).close(); true }
        catch {
          case _: FileAlreadyExistsException => false
          // some stores signal the exists-race as a bare IOException; only
          // treat it as contention when the lock file is actually there
          case e: java.io.IOException => if (f.exists(p)) false else throw e
        }
    if (created) {
      try {
        val out = f.create(p, true)
        try out.write(
          (s"${java.net.InetAddress.getLocalHost.getHostName} pid=${ProcessHandle.current.pid} " +
            s"epochMs=${System.currentTimeMillis()}").getBytes(StandardCharsets.UTF_8))
        finally out.close()
      } catch { case _: java.io.IOException => () } // forensics only
    }
    created
  }
}
