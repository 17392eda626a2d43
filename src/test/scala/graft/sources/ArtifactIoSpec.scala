package graft

import graft.sources.{ArtifactIo, LocalArtifactIo}

/** ArtifactIo: the one seam between the artifact machinery and its
  * store — local `java.nio` for scheme-less paths, Hadoop `FileSystem`
  * for rename-atomic scheme'd stores (exercised here via `file:`), loud
  * rejection for rename-by-copy schemes.
  */
class ArtifactIoSpec extends SparkSuite {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("forPath dispatch: scheme-less → local io, file: → hadoop io, s3a/gs/wasb → loud") {
    assert(ArtifactIo.forPath("/tmp/x") eq LocalArtifactIo)
    assert(ArtifactIo.forPath("C:/data/x") eq LocalArtifactIo,
      "a Windows drive letter is a local path, not a URI scheme")
    assert(!(ArtifactIo.forPath("file:/tmp/x") eq LocalArtifactIo))
    assert(!(ArtifactIo.forPath("hdfs://nn/x") eq LocalArtifactIo))
    for (bad <- Seq("s3a://b/x", "gs://b/x", "wasb://c@a/x", "s3://b/x")) {
      val ex = intercept[IllegalArgumentException](ArtifactIo.forPath(bad))
      assert(ex.getMessage.contains("rename-atomic allowlist"), ex.getMessage)
      assert(ex.getMessage.contains("Snapshots"), ex.getMessage)
    }
  }

  private def roundtrip(io: ArtifactIo, root: String): Unit = {
    val dir = root + "/artifact"
    assert(!io.exists(dir))
    io.createDirs(dir)
    assert(io.exists(dir) && io.isDirectory(dir))
    // empty dir: no data files; bookkeeping names are invisible
    assert(!io.hasDataFiles(dir))
    io.touch(dir + "/_SUCCESS")
    io.touch(dir + "/.marker")
    assert(!io.hasDataFiles(dir))
    io.touch(dir + "/part-0001")
    assert(io.hasDataFiles(dir))
    // atomic publish: readBytes sees old-or-new, replace works
    assert(io.readBytes(dir + "/totals").isEmpty)
    io.writeAtomic(dir + "/totals", "3 17".getBytes("UTF-8"))
    assert(io.readBytes(dir + "/totals").map(new String(_, "UTF-8")).contains("3 17"))
    io.writeAtomic(dir + "/totals", "4 21".getBytes("UTF-8"))
    assert(io.readBytes(dir + "/totals").map(new String(_, "UTF-8")).contains("4 21"))
    // no .tmp staging debris left behind the atomic writes (inspect the
    // directory via java.io — both stores here are ultimately local disk)
    assert(!new java.io.File(root.stripPrefix("file:") + "/artifact")
      .listFiles().exists(_.getName.endsWith(".tmp")))
    // marker delete is idempotent
    io.delete(dir + "/.marker")
    io.delete(dir + "/.marker")
    assert(!io.exists(dir + "/.marker"))
    // rename (no overwrite) moves directories — the compact-swap primitive
    io.rename(dir, root + "/swapped")
    assert(!io.exists(dir) && io.exists(root + "/swapped/part-0001"))
    io.deleteTree(root + "/swapped")
    assert(!io.exists(root + "/swapped"))
    io.deleteTree(root + "/swapped") // missing tree is a no-op
  }

  test("local io primitives roundtrip") {
    roundtrip(LocalArtifactIo, tmpDir("graft-aio-local"))
  }

  test("hadoop io primitives roundtrip on the file: scheme") {
    val root = tmpDir("graft-aio-hadoop")
    roundtrip(ArtifactIo.forPath("file:" + root), "file:" + root)
  }

  test("hadoop io lock: mutual exclusion, tryWithLock contention, loud bounded timeout") {
    val root = tmpDir("graft-aio-lock")
    val io = ArtifactIo.forPath("file:" + root)
    val lock = "file:" + root + "/art.lock"
    // mutual exclusion between two threads: the interleaving inside the
    // critical section must never overlap
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t = new Thread(() => io.withLock(lock, 10000L, "spec", "hint") {
      log.add("a-in"); Thread.sleep(150); log.add("a-out")
    })
    t.start()
    val spinDeadline = System.nanoTime() + 5000000000L
    while (!log.contains("a-in") && System.nanoTime() < spinDeadline) Thread.sleep(5)
    assert(log.contains("a-in"), "holder thread never acquired")
    assert(io.tryWithLock(lock) { "won" }.isEmpty,
      "tryWithLock must observe the held lock")
    io.withLock(lock, 10000L, "spec", "hint") { log.add("b-in"); log.add("b-out") }
    t.join()
    assert(log.toArray.toSeq == Seq("a-in", "a-out", "b-in", "b-out"), log.toString)
    // released: tryWithLock now wins, and nests its own release correctly
    assert(io.tryWithLock(lock) { "won" }.contains("won"))
    // a crashed holder (lock file left behind) times out LOUDLY with the
    // operator remediation in the message — no silent mtime-based steal
    val held = "file:" + root + "/crashed.lock"
    io.touch(held)
    val ex = intercept[IllegalStateException](
      io.withLock(held, 200L, "spec-crashed", "the hint") { fail("must not run") })
    assert(ex.getMessage.contains("spec-crashed"), ex.getMessage)
    assert(ex.getMessage.contains("delete the lock file"), ex.getMessage)
  }

  test("scored-index machinery end-to-end on a file:-scheme'd path equals the local-path build") {
    import spark.implicits._
    import graft.operators.InvertedIndex
    val localRoot = tmpDir("graft-aio-idx-local")
    val hadoopRoot = tmpDir("graft-aio-idx-hadoop")
    val localPath = localRoot + "/postings"
    val fsPath = "file:" + hadoopRoot + "/postings"
    val base = Seq((0L, "red fox jumps high"), (1L, "red red dog")).toDF("doc_id", "text")
    val batch = Seq((2L, "blue fox runs"), (3L, "green bird song")).toDF("doc_id", "text")
    for (p <- Seq(localPath, fsPath)) {
      InvertedIndex.materializeScored(base, "doc_id", "text", p): Unit
      InvertedIndex.appendScored(batch, "doc_id", "text", p): Unit
    }
    // identical postings, identical exact totals, identical attach stats
    def rows(p: String) = spark.read.parquet(p)
      .select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(rows(fsPath) == rows(localPath))
    assert(InvertedIndex.readTotals(fsPath) == InvertedIndex.readTotals(localPath))
    val (_, statsFs) = InvertedIndex.attachScored(spark, fsPath, "doc_id")
    val (_, statsLocal) = InvertedIndex.attachScored(spark, localPath, "doc_id")
    assert(statsFs == statsLocal)
    // search served off the file:-scheme'd artifact matches too
    def top(p: String) = {
      val (scored, stats) = InvertedIndex.attachScored(spark, p, "doc_id")
      InvertedIndex.searchBm25(scored, "doc_id", Seq("red", "fox"), 3,
          stats = Some(stats))
        .as[(Long, Double)].collect().toSeq
    }
    assert(top(fsPath) == top(localPath))
  }
}
