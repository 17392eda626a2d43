package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** ScreenedIngest: the r15 maintenance loop as one continuous streaming
  * pipeline — each micro-batch screens against the CURRENT sketch and
  * the accepted batch enters it before the next batch arrives.
  */
class ScreenedIngestSpec extends SparkSuite {
  import spark.implicits._

  private def stageJson(dropDir: String, name: String, mtimeMs: Long,
      rows: Seq[(Long, String)]): Unit =
    graft.queries.QueryTmp.stageJsonBatch(
      rows.toDF("doc_id", "text"), dropDir, name, mtimeMs)

  private def runStream(dropDir: String, sketch: String, corpus: String): Unit = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = ss.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(dropDir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-si-ckpt").toString
    val q = graft.streaming.ScreenedIngest.start(
      stream, "doc_id", "text", sketch, corpus, ckpt)
    try q.processAllAvailable() finally q.stop()
  }

  private def corpusIds(corpus: String): Set[Long] =
    spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet

  test("day-zero bootstrap: no pre-built sketch, no corpus dir — the first batch seeds both") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-si0-drop").toString
    val root = Files.createTempDirectory("graft-si0").toString
    val corpus = root + "/corpus"
    val sketch = root + "/sketch"
    stageJson(drop, "b0.json", 1700000000000L,
      Seq((1L, "first ever document alpha beta"), (2L, "first ever document alpha beta")))
    runStream(drop, sketch, corpus)
    // within-batch dups pass by contract; both rows land and both sketch
    assert(corpusIds(corpus) == Set(1L, 2L))
    // a second batch duplicating batch 1 is now fully screened
    stageJson(drop, "b1.json", 1700000060000L, Seq((3L, "first ever document alpha beta")))
    runStream(drop, sketch, corpus)
    assert(corpusIds(corpus) == Set(1L, 2L))
  }

  test("rename-by-copy store schemes are rejected loudly (the torn-commit hazard)") {
    // s3a & co. rename by copy+delete: the artifact machinery's
    // temp+atomic-rename commit protocol would tear there — out-of-
    // allowlist input must fail up front with the capability message
    // (rename-atomic schemes like hdfs:// and file: now pass the guard
    // and route through the Hadoop-backed ArtifactIo)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
      .json(java.nio.file.Files.createTempDirectory("graft-si-scheme").toString)
    for (bad <- Seq("s3a://bucket/sketch", "gs://bucket/sketch", "wasb://c@a/sketch")) {
      val ex = intercept[IllegalArgumentException](
        graft.streaming.ScreenedIngest.start(stream, "doc_id", "text",
          bad, "/tmp/ok-corpus", "/tmp/ok-ckpt"))
      assert(ex.getMessage.contains("rename-atomic allowlist"), ex.getMessage)
      assert(ex.getMessage.contains("sketchPath"), ex.getMessage)
      val ex2 = intercept[IllegalArgumentException](
        graft.streaming.ScreenedIngest.start(stream, "doc_id", "text",
          "/tmp/ok-sketch", bad, "/tmp/ok-ckpt"))
      assert(ex2.getMessage.contains("rename-atomic allowlist"), ex2.getMessage)
    }
  }

  test("file:-scheme'd artifact paths run the whole ingest loop through the Hadoop-backed io") {
    // the r17 capability: the same streaming loop, every artifact probe /
    // lock / append routed through HadoopArtifactIo instead of java.nio —
    // exercised on the local store via the file: scheme
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-sif-drop").toString
    val root = Files.createTempDirectory("graft-sif").toString
    val corpus = "file:" + root + "/corpus"
    val sketch = "file:" + root + "/sketch"
    stageJson(drop, "b0.json", 1700000000000L,
      Seq((1L, "hadoop io document alpha beta gamma"), (2L, "totally different text here now")))
    runStream(drop, sketch, corpus)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L))
    // a duplicate of doc 1 in a later batch screens OFF the file:-scheme'd
    // sketch (cross-side drop); a fresh doc passes
    stageJson(drop, "b1.json", 1700000060000L,
      Seq((3L, "hadoop io document alpha beta gamma"), (4L, "unrelated brand new content words")))
    runStream(drop, sketch, corpus)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 4L))
  }

  test("idScreen closes the redelivery leaks: null-text rows and hot-bucket drops never duplicate") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-si2-drop").toString
    val root = Files.createTempDirectory("graft-si2").toString
    val corpus = root + "/corpus"
    val sketch = root + "/sketch"
    // 60 identical docs make every (chunk, val) bucket of that text hot
    // past maxBucketSize = 50 — the guard then drops the shared rows, so
    // doc 500 can never SELF-match on redelivery; and doc 900's null
    // text never sketches at all. Without the id screen, a whole-stream
    // rerun (the redelivery shape) would append both again.
    val hotText = "hot templated boilerplate row"
    val base = (1L to 60L).map(i => (i, hotText)).toDF("doc_id", "text")
    base.write.mode("overwrite").parquet(corpus)
    Dedup.simhashSketch(base, "doc_id", "text").write.mode("overwrite").parquet(sketch)
    val t = Files.createTempDirectory("graft-si2-b").toString
    Seq((500L, Some(hotText)), (900L, Option.empty[String])).toDF("doc_id", "text")
      .repartition(1).write.mode("overwrite").json(t)
    val part = new java.io.File(t).listFiles().filter(_.getName.endsWith(".json")).head.toPath
    java.nio.file.Files.move(part, java.nio.file.Paths.get(drop, "b0.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    def run(): Unit = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
      val stream = ss.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(drop)
      val ckpt = Files.createTempDirectory("graft-si2-ckpt").toString
      val q = graft.streaming.ScreenedIngest.start(stream, "doc_id", "text",
        sketch, corpus, ckpt, maxBucketSize = 50)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // doc 500 was admitted UNSCREENED (all its buckets are hot — the
    // documented guard tradeoff); doc 900 is unmatchable — both land once
    assert(corpusIds(corpus) == (1L to 60L).toSet + 500L + 900L)
    val afterFirst = spark.read.parquet(corpus).count()
    // redelivery shape: rerun the whole stream with a fresh checkpoint —
    // neither leak row may duplicate (the id screen catches both)
    run()
    assert(spark.read.parquet(corpus).count() == afterFirst,
      "idScreen must keep hot-bucket and null-text rows exactly-once")
  }

  test("each batch screens against everything admitted so far; reruns are idempotent") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-si-drop").toString
    val corpus = Files.createTempDirectory("graft-si").toString + "/corpus"
    val sketch = Files.createTempDirectory("graft-si").toString + "/sketch"
    val baseText = "totally unrelated base document about alpha beta gamma delta"
    val yText = "a brand new unique document mentioning epsilon zeta eta theta"
    val zText = "yet another one of a kind text regarding iota kappa lambda mu"
    val base = Seq((1L, baseText)).toDF("doc_id", "text")
    base.write.mode("overwrite").parquet(corpus)
    Dedup.simhashSketch(base, "doc_id", "text").write.mode("overwrite").parquet(sketch)
    // batch 1: a dup of the BASE (dropped) + a unique doc (kept);
    // batch 2: a dup of batch 1's KEPT doc — dropped ONLY if the kept
    // batch actually entered the sketch (the staleness closure, live) —
    // plus another unique doc (kept)
    stageJson(drop, "b0.json", 1700000000000L, Seq((10L, baseText), (11L, yText)))
    stageJson(drop, "b1.json", 1700000060000L, Seq((20L, yText), (21L, zText)))
    runStream(drop, sketch, corpus)
    assert(corpusIds(corpus) == Set(1L, 11L, 21L),
      "batch 2's dup of batch 1's kept doc must be caught by the MAINTAINED sketch")
    // rerun over the same fixture with a fresh checkpoint: every batch
    // fully self-matches in the sketch and appends nothing — the
    // redelivery-idempotence contract, end to end
    runStream(drop, sketch, corpus)
    assert(corpusIds(corpus) == Set(1L, 11L, 21L), "rerun must be a corpus no-op")
    assert(spark.read.parquet(corpus).count() == 3, "no duplicate corpus rows either")
  }
}
