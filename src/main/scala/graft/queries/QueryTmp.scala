package graft.queries

/** Temp directories for query-gate fixtures: created under the system
  * tmpdir and recursively deleted on JVM exit (`deleteOnExit` never
  * removes a non-empty directory). Bench invokes each gate 3× (warm-up
  * + 2 timed) — without the hook every run would strand parquet copies
  * in /tmp.
  */
private[graft] object QueryTmp {

  /** Copy a parquet source into a staging dir, tolerating both layouts
    * the driver has shipped: a single `.parquet` FILE (copied as-is) or a
    * directory-shaped dataset (part-files copied flat, so the streaming
    * file source lists them as individual inputs). `_`-prefixed and
    * `.crc` bookkeeping files are skipped.
    */
  def stageParquet(src: String, dstDir: String, name: String): Unit = {
    import java.nio.file.{Files, Paths}
    val s = Paths.get(src)
    if (Files.isDirectory(s)) {
      val it = Files.list(s)
      try {
        it.iterator().forEachRemaining { p =>
          val fn = p.getFileName.toString
          if (!fn.startsWith("_") && !fn.startsWith(".")) {
            // fail loudly on a partitioned layout (date=.../part-*) —
            // silently skipping subdirectories would stage an EMPTY
            // dataset and turn a layout change into a confusing
            // hash mismatch (or a vacuous rows-only pass) downstream
            if (Files.isDirectory(p)) throw new IllegalArgumentException(
              s"stageParquet: $src contains subdirectory '$fn' — partitioned " +
                "layouts are not supported by flat staging")
            Files.copy(p, Paths.get(dstDir, s"$name-$fn")): Unit
          }
        }
      } finally it.close()
    } else {
      Files.copy(s, Paths.get(dstDir, name)): Unit
    }
  }

  def dir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d.toFile)
    }, s"graft-tmp-clean-$tag"))
    d.toString
  }

  /** Stage `df` as ONE JSON file at `dstDir/name` with a pinned mtime —
    * the streaming-fixture protocol (the file source processes
    * oldest-first, so strictly-increasing mtimes pin micro-batch order)
    * in ONE copy, shared by the st4/st5 gates, the `--ingest`/
    * `--ixingest` probes, and the ingest specs: a change to the staging
    * mechanics (part-file naming, the mtime convention) cannot drift
    * between them.
    */
  def stageJsonBatch(df: org.apache.spark.sql.DataFrame, dstDir: String,
      name: String, mtimeMs: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val t = dir("stage-json")
    df.repartition(1).write.mode("overwrite").json(t)
    val part = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".json")).head.toPath
    Files.createDirectories(Paths.get(dstDir))
    val dst = Paths.get(dstDir, name)
    try Files.move(part, dst, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // the staging temp dir (java.io.tmpdir, often tmpfs) and dstDir can
      // live on different filesystems, where a cross-device ATOMIC_MOVE
      // throws — stage a copy INSIDE dstDir (dot-prefixed so the file
      // source never lists the partial write), fsync it, then publish
      // with a same-directory atomic rename
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        val staged = Paths.get(dstDir, s".$name.staging")
        Files.copy(part, staged, StandardCopyOption.REPLACE_EXISTING)
        val ch = java.nio.channels.FileChannel.open(staged,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.force(true) finally ch.close()
        Files.move(staged, dst, StandardCopyOption.ATOMIC_MOVE)
    }
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs)): Unit
  }
}
