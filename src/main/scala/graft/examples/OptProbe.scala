package graft.examples

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions.col

import graft.{GraftSession, SparkEntry, Tables}

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * Runs named declared queries (plus the `v8c`/`cc` bench-only bodies)
  * under the noop sink with a SparkListener tallying the distributed-
  * shape metrics the optimization guide says to look at BEFORE touching
  * anything: job count (per-action scheduling overhead), stage count
  * (shuffle boundaries), task count, and total shuffle read/write bytes.
  * Wall is min-of-3 after one warm-up (the Bench convention); the
  * listener tallies cover the LAST timed run only (so warm-up AQE
  * re-planning doesn't inflate the shape numbers).
  *
  * Usage: `runMain graft.examples.OptProbe [sfDir] name...`
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    // the first positional is the data dir ONLY if it exists on disk — a
    // bare `OptProbe v8` must not silently measure zero queries against
    // a data dir named "v8"
    val headIsDir = args.headOption.exists(a =>
      !a.startsWith("--") && java.nio.file.Files.isDirectory(java.nio.file.Paths.get(a)))
    val sfDir = if (headIsDir) args.head else "/root/testdata/sf0.1"
    val named = (if (headIsDir) args.drop(1) else args).toSeq
    val names = // --all = every declared query (the checklist sweep), then any extras
      if (named.contains("--all"))
        SparkEntry.queries.keys.toSeq.sorted ++ named.filterNot(_ == "--all").filterNot(SparkEntry.queries.contains)
      else named
    val special = Set("v8c", "cc", "buildscored_plan")
    val unknown = names.filterNot(n => special(n) || SparkEntry.queries.contains(n))
    require(names.nonEmpty, "OptProbe: no query names given (pass names, or --all)")
    require(unknown.isEmpty, // fail BEFORE minutes of measurement, not at the typo
      s"OptProbe: unknown queries ${unknown.mkString(", ")} (not declared, not in $special)")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val shRead = new AtomicLong; val shWrite = new AtomicLong
    // r20: CPU-density counters — executorRunTime (ms the tasks occupied
    // task slots), executorCpuTime (ns actually on-CPU), jvmGCTime (ms in
    // GC inside those tasks). run/wall ≈ effective parallelism;
    // cpu/run ≈ how much of the slot time was real compute (low = fetch
    // wait / scheduling / GC / blocking I/O); gc/run = the GC share.
    val runMs = new AtomicLong; val cpuNs = new AtomicLong; val gcMs = new AtomicLong
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) { stages.incrementAndGet(); () }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (collecting && e.taskMetrics != null) {
          tasks.incrementAndGet()
          shRead.addAndGet(e.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
          runMs.addAndGet(e.taskMetrics.executorRunTime)
          cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
          gcMs.addAndGet(e.taskMetrics.jvmGCTime)
          ()
        }
    })

    def measure(name: String)(run: => Unit): Unit = {
      run // warm-up
      val walls = (1 to 3).map { i =>
        val last = i == 3
        if (last) {
          // let queued listener events from prior runs drain before tallying
          org.apache.spark.sql.graftbridge.flushListenerBus(spark)
          jobs.set(0); stages.set(0); tasks.set(0); shRead.set(0); shWrite.set(0)
          runMs.set(0); cpuNs.set(0); gcMs.set(0)
          collecting = true
        }
        val t0 = System.nanoTime()
        run
        val w = (System.nanoTime() - t0) / 1e9
        if (last) {
          org.apache.spark.sql.graftbridge.flushListenerBus(spark)
          collecting = false
        }
        w
      }
      val lastWall = walls.last
      println(f"[opt] $name%-28s wall=${walls.min}%6.3f s  jobs=${jobs.get}%3d stages=${stages.get}%4d " +
        f"tasks=${tasks.get}%5d shufR=${shRead.get / 1024}%8d KiB shufW=${shWrite.get / 1024}%8d KiB " +
        f"run=${runMs.get / 1000.0}%7.2f s cpu=${cpuNs.get / 1e9}%7.2f s gc=${gcMs.get / 1000.0}%5.2f s " +
        f"par=${runMs.get / 1000.0 / lastWall}%4.1f (last wall=$lastWall%6.3f)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    names.foreach {
      case "buildscored_plan" => // the write-side plan the ii gates pay (not
        // visible in the gate dumps — materializeScored writes eagerly)
        graft.operators.InvertedIndex.buildScored(
          Tables.load(spark, sfDir, "documents"), "doc_id", "text").explain("formatted")
      case "v8c" => // bench-only converged-pagerank body (Bench.scala fixture)
        val emb = Tables.load(spark, sfDir, "embeddings")
        val eDir = graft.queries.QueryTmp.dir("opt-v8c") + "/edges"
        graft.operators.Similarity.annKnnGraph(emb, "vec_id", "embedding", 64, k = 3, bits = 6)
          .write.mode("overwrite").parquet(eDir)
        val edges = spark.read.parquet(eDir)
        measure("v8c_pagerank_converged") {
          val (pr, _) = graft.operators.Graph.pageRankConverged(
            edges, "vec_id", "neighbor", emb, "vec_id", tol = 1e-6, maxIters = 100)
          try noop(pr)
          finally org.apache.spark.sql.graftbridge.releaseCheckpoints(pr)
        }
      case "cc" => // isolated connected-components over the x1 pair set
        val txt = graft.operators.Dedup.minhashNearDupPairs(
          Tables.load(spark, sfDir, "documents"), "doc_id", "text", bands = 16)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val pairsDir = graft.queries.QueryTmp.dir("opt-cc") + "/pairs"
        txt.write.mode("overwrite").parquet(pairsDir)
        val pairs = spark.read.parquet(pairsDir)
        measure("cc_over_x1_pairs") {
          noop(graft.operators.Dedup.connectedComponents(pairs, "a", "b"))
        }
      case name =>
        val fn = SparkEntry.queries(name)
        measure(name)(noop(fn(spark, sfDir)))
    }
    spark.stop()
  }
}
