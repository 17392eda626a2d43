package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, KMeans, Similarity}

/** Sketch/assigned-artifact maintenance (r15): the staleness closure of
  * the incremental screens. The invariant under test everywhere:
  * screen-after-append ≡ rebuild-then-screen — an accepted batch folded
  * into the saved artifact at batch cost must be indistinguishable from
  * an O(corpus) re-sketch.
  */
class SketchMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/art"

  private def keptIds(df: DataFrame): Set[Long] =
    df.select(col(df.columns.head)).as[Long].collect().toSet

  // ---- minhash (text) ----

  private lazy val docs = Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"), col("text"))

  private def minhashScreen(sketchPath: String, oldSide: DataFrame): Set[Long] =
    keptIds(Dedup.incrementalNearDupKeepWithSketch(
      docs.filter(col("doc_id") % 10 === 7), spark.read.parquet(sketchPath), oldSide,
      "doc_id", "text"))

  test("minhash append: multi-batch screen-after-append == rebuild-then-screen at every step") {
    val base = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8 &&
      col("doc_id") % 10 =!= 9)
    val b1 = docs.filter(col("doc_id") % 10 === 8)
    val b2 = docs.filter(col("doc_id") % 10 === 9)
    val path = tmp("graft-mh-append")
    Dedup.minhashSketch(base, "doc_id", "text").write.mode("overwrite").parquet(path)

    // step 1: base + b1
    Dedup.appendToMinhashSketch(b1, "doc_id", "text", path)
    val old1 = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 9)
    val rebuilt1 = tmp("graft-mh-rb1")
    Dedup.minhashSketch(old1, "doc_id", "text").write.mode("overwrite").parquet(rebuilt1)
    assert(minhashScreen(path, old1) == minhashScreen(rebuilt1, old1),
      "after the first append the screen must equal a rebuilt base∪b1 sketch")

    // step 2: base + b1 + b2 (fragments now from two appends)
    Dedup.appendToMinhashSketch(b2, "doc_id", "text", path)
    val old2 = docs.filter(col("doc_id") % 10 =!= 7)
    val rebuilt2 = tmp("graft-mh-rb2")
    Dedup.minhashSketch(old2, "doc_id", "text").write.mode("overwrite").parquet(rebuilt2)
    val afterAppend = minhashScreen(path, old2)
    assert(afterAppend == minhashScreen(rebuilt2, old2),
      "after the second append the screen must equal a rebuilt full-old-side sketch")

    // re-append is screen-idempotent (the crash-recovery contract:
    // duplicate fragment ids only add candidates the verify de-dups)
    Dedup.appendToMinhashSketch(b2, "doc_id", "text", path)
    assert(minhashScreen(path, old2) == afterAppend, "re-append must not change the screen")

    // compaction merges fragments back to one row per (band, key) and
    // preserves the screen exactly
    val fragmented = spark.read.parquet(path)
      .groupBy("band", "key").count().filter(col("count") > 1).count()
    assert(fragmented > 0, "fixture must actually fragment, or compaction is untested")
    Dedup.compactMinhashSketch(spark, path)
    val compacted = spark.read.parquet(path)
    assert(compacted.groupBy("band", "key").count().filter(col("count") > 1).count() == 0,
      "compaction must leave one row per bucket key")
    assert(minhashScreen(path, old2) == afterAppend, "compaction must preserve the screen")
  }

  test("minhash append closes the staleness gap: a near-dup of an ACCEPTED batch doc is caught only after the append") {
    // 12-word docs; the near-dup changes ONLY the last word → 9/11
    // shingle jaccard ≈ 0.818 ≥ 0.8 (a true near-dup), and the stale
    // sketch knows nothing about doc 100
    val words = (1 to 12).map(i => s"w$i")
    val existing = Seq((1L, "completely unrelated existing text about something else entirely here"))
      .toDF("doc_id", "text")
    val accepted = Seq((100L, words.mkString(" "))).toDF("doc_id", "text")
    val nextBatch = Seq((200L, (words.init :+ "CHANGED").mkString(" "))).toDF("doc_id", "text")
    val path = tmp("graft-mh-stale")
    Dedup.minhashSketch(existing, "doc_id", "text").write.mode("overwrite").parquet(path)

    // day 1: the accepted batch screens clean (nothing like it exists)
    val day1 = keptIds(Dedup.incrementalNearDupKeepWithSketch(
      accepted, spark.read.parquet(path), existing, "doc_id", "text"))
    assert(day1 == Set(100L))

    // day 2 against the STALE sketch: the near-dup of doc 100 passes
    // undetected — the exact silent-miss this op family exists to close
    val stale = keptIds(Dedup.incrementalNearDupKeepWithSketch(
      nextBatch, spark.read.parquet(path), existing, "doc_id", "text"))
    assert(stale == Set(200L), "stale sketch must miss the near-dup (the documented gap)")

    // day 2 after the append: caught
    Dedup.appendToMinhashSketch(accepted, "doc_id", "text", path)
    val maintained = keptIds(Dedup.incrementalNearDupKeepWithSketch(
      nextBatch, spark.read.parquet(path), existing.unionByName(accepted),
      "doc_id", "text"))
    assert(maintained == Set.empty[Long], "appended sketch must catch the near-dup")
  }

  test("concurrent appends serialize under the artifact lock; both batches land") {
    val base = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8 &&
      col("doc_id") % 10 =!= 9)
    val path = tmp("graft-mh-race")
    Dedup.minhashSketch(base, "doc_id", "text").write.mode("overwrite").parquet(path)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(8, 9).map { m =>
      new Thread(() =>
        try Dedup.appendToMinhashSketch(
          docs.filter(col("doc_id") % 10 === m), "doc_id", "text", path)
        catch { case t: Throwable => errs.add(t): Unit })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing appends must serialize, not fail: ${errs.peek()}")
    val old2 = docs.filter(col("doc_id") % 10 =!= 7)
    val rebuilt = tmp("graft-mh-race-rb")
    Dedup.minhashSketch(old2, "doc_id", "text").write.mode("overwrite").parquet(rebuilt)
    assert(minhashScreen(path, old2) == minhashScreen(rebuilt, old2),
      "after racing appends the artifact must hold BOTH batches' buckets")
  }

  // ---- SimHash (text, self-sufficient artifact) ----

  test("simhash incremental screen: differential vs all-pairs; append == rebuild; compaction preserves") {
    val old = docs.filter(col("doc_id") % 10 =!= 7)
    val batch = docs.filter(col("doc_id") % 10 === 7)
    // differential oracle: kept = batch ids minus those in any CROSS-side
    // all-pairs simhash match (within-batch dups are kept by contract)
    val crossMatched = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        maxBucketSize = Int.MaxValue)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        Seq(a, b).filter(id => id % 10 == 7 && Seq(a, b).exists(o => o % 10 != 7))
      }.toSet
    val batchIds = keptIds(batch.select(col("doc_id")))
    val path = tmp("graft-sh-full")
    Dedup.simhashSketch(old, "doc_id", "text").write.mode("overwrite").parquet(path)
    def screen(p: String) = keptIds(Dedup.incrementalSimhashKeep(
      batch, spark.read.parquet(p), "doc_id", "text", maxBucketSize = Int.MaxValue))
    assert(screen(path) == batchIds -- crossMatched)
    assert(crossMatched.nonEmpty, "fixture must drop at least one batch id")
    // maintenance: base ∌ {7,8} + appended 8 must equal the full rebuild
    val path2 = tmp("graft-sh-append")
    Dedup.simhashSketch(
        docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8),
        "doc_id", "text")
      .write.mode("overwrite").parquet(path2)
    Dedup.appendToSimhashSketch(docs.filter(col("doc_id") % 10 === 8),
      "doc_id", "text", path2)
    assert(screen(path2) == screen(path),
      "appended SimHash sketch must screen like a rebuilt one")
    // compaction merges (chunk, val) fragments of STRUCT members exactly
    Dedup.compactSimhashSketch(spark, path2)
    assert(spark.read.parquet(path2)
      .groupBy("chunk", "val").count().filter(col("count") > 1).count() == 0)
    assert(screen(path2) == screen(path), "compaction must preserve the screen")
  }

  // ---- SRP (vectors) ----

  private lazy val emb = Tables.load(spark, sf0001, "embeddings")

  test("srp append: screen-after-append == rebuild-then-screen; compaction preserves it") {
    val bits = 4
    val base = emb.filter(col("vec_id") % 10 =!= 7 && col("vec_id") % 10 =!= 8)
    val b1 = emb.filter(col("vec_id") % 10 === 8)
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val path = tmp("graft-srp-append")
    Similarity.srpSketch(base, "vec_id", "embedding", 64, bits)
      .write.mode("overwrite").parquet(path)
    Similarity.appendToSrpSketch(b1, "vec_id", "embedding", 64, path, bits)
    def screen(p: String) = keptIds(Similarity.incrementalAnnKeep(
      batch, spark.read.parquet(p), old, "vec_id", "embedding", 64, 0.45, bits,
      maxBucketSize = Int.MaxValue))
    val rebuilt = tmp("graft-srp-rb")
    Similarity.srpSketch(old, "vec_id", "embedding", 64, bits)
      .write.mode("overwrite").parquet(rebuilt)
    val got = screen(path)
    assert(got == screen(rebuilt), "appended SRP sketch must screen like a rebuilt one")
    // at bits=4 the two sides share buckets virtually surely; an empty
    // match set would make the equality vacuous
    val batchIds = keptIds(batch.select(col("vec_id")))
    assert(got != batchIds, "fixture must drop at least one batch id")
    Similarity.compactSrpSketch(spark, path)
    assert(spark.read.parquet(path)
      .groupBy("bucket").count().filter(col("count") > 1).count() == 0)
    assert(screen(path) == got, "compaction must preserve the screen")
    // auto-bits keying is refused (the srpSketch contract, append side)
    intercept[IllegalArgumentException] {
      Similarity.appendToSrpSketch(b1, "vec_id", "embedding", 64, path,
        bits = Similarity.AutoBits)
    }
  }

  test("compact auto-recovers the crash-between-renames state instead of sweeping the only copies") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val bits = 4
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val path = tmp("graft-srp-crash")
    Similarity.srpSketch(old, "vec_id", "embedding", 64, bits)
      .write.mode("overwrite").parquet(path)
    def screen() = keptIds(Similarity.incrementalAnnKeep(
      batch, spark.read.parquet(path), old, "vec_id", "embedding", 64, 0.45, bits,
      maxBucketSize = Int.MaxValue))
    val want = screen()
    // simulate a compact that died between its two renames: the live
    // path is gone, the pre-compaction copy sits under `.old`, and a
    // half-written tmp dir is also present
    Files.move(Paths.get(path), Paths.get(path + "._graft_compact_old"),
      StandardCopyOption.ATOMIC_MOVE)
    Files.createDirectories(Paths.get(path + "._graft_compact_tmp"))
    Files.write(Paths.get(path + "._graft_compact_tmp", "part-junk.parquet"),
      "debris".getBytes("UTF-8"))
    // a retried compact must RESTORE the artifact, not delete the only
    // surviving copy as "debris" and then fail the read
    Similarity.compactSrpSketch(spark, path)
    assert(Files.exists(Paths.get(path)), "artifact not restored")
    assert(!Files.exists(Paths.get(path + "._graft_compact_old")))
    assert(!Files.exists(Paths.get(path + "._graft_compact_tmp")))
    assert(screen() == want, "recovered-then-compacted artifact must screen identically")
  }

  test("screenRetrying absorbs the compact rename window: stale first attempt, fresh retry wins") {
    import graft.operators.SketchArtifact
    val path = tmp("graft-retry")
    Seq((1L, Seq(10L)), (2L, Seq(20L))).toDF("bucket", "ids")
      .write.parquet(path)
    SketchArtifact.append(Seq((1L, Seq(30L))).toDF("bucket", "ids"), path)
    // a reader whose plan resolved BEFORE the compact pins the old file
    // listing — exactly what a live screen racing a compact holds
    val stale = spark.read.parquet(path)
    SketchArtifact.compact(spark, path, Seq("bucket"))
    var attempts = 0
    val total = SketchArtifact.screenRetrying(retryDelayMs = 1L) {
      attempts += 1
      // attempt 1 executes the stale plan (its part files are gone —
      // the task-side FileNotFoundException, Spark-wrapped); the retry
      // follows the contract and re-reads the path fresh
      val frame = if (attempts == 1) stale else spark.read.parquet(path)
      frame.select(explode(col("ids")).as("id")).count()
    }
    assert(attempts == 2, "first attempt must fail against the swapped files")
    assert(total == 3L, "retry must read the compacted (screen-equivalent) artifact")
  }

  test("screenRetrying stays loud when the artifact is genuinely missing") {
    import graft.operators.SketchArtifact
    val missing = tmp("graft-retry-missing") + "/never-written"
    var attempts = 0
    intercept[org.apache.spark.sql.AnalysisException] {
      SketchArtifact.screenRetrying(retryDelayMs = 1L) {
        attempts += 1
        spark.read.parquet(missing).count()
      }
    }
    assert(attempts == 2, "one retry, then the failure propagates")
  }

  // ---- assigned corpus (SemDeDup) ----

  test("appendAssigned: screen against the appended table == screen against the directly-assigned old side") {
    val model = KMeans.fit(emb, "vec_id", "embedding", k = 4, maxIters = 3)
    def assigned(part: DataFrame) =
      KMeans.assign(part, "vec_id", "embedding", model)
        .join(part.select(col("vec_id"), col("embedding")), "vec_id")
    val base = emb.filter(col("vec_id") % 10 =!= 7 && col("vec_id") % 10 =!= 8)
    val b1 = emb.filter(col("vec_id") % 10 === 8)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val path = tmp("graft-assigned")
    assigned(base).write.mode("overwrite").parquet(path)
    Similarity.appendAssigned(assigned(b1), path)
    def screen(oldAssigned: DataFrame) = keptIds(Similarity.incrementalSemDedupKeep(
      assigned(batch), oldAssigned, "vec_id", "embedding", "cluster", 0.45,
      maxCellSize = Int.MaxValue))
    val got = screen(spark.read.parquet(path))
    assert(got == screen(assigned(old)),
      "appended assigned table must screen like the directly-assigned old side")
    assert(got != keptIds(batch.select(col("vec_id"))),
      "fixture must drop at least one batch id")
  }
}
