package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex

/** IndexIngest: streaming maintenance of the scored BM25 index — each
  * micro-batch folds only itself into the standing artifact, exact
  * totals included, and redelivery appends nothing.
  */
class IndexIngestSpec extends SparkSuite {
  import spark.implicits._

  private def stageJson(dropDir: String, name: String, mtimeMs: Long,
      rows: Seq[(java.lang.Long, String)]): Unit =
    graft.queries.QueryTmp.stageJsonBatch(
      rows.toDF("doc_id", "text"), dropDir, name, mtimeMs)

  private def runStream(dropDir: String, index: String): Unit = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = ss.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(dropDir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ix-ckpt").toString
    val q = graft.streaming.IndexIngest.start(stream, "doc_id", "text", index, ckpt)
    try q.processAllAvailable() finally q.stop()
  }

  test("streamed appends equal a scratch rebuild, totals included; redelivery is a no-op") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-ix-drop").toString
    val index = Files.createTempDirectory("graft-ix-root").toString + "/postings"
    val base = Seq((0L, "red fox jumps"), (1L, "red red dog")).toDF("doc_id", "text")
    InvertedIndex.materializeScored(base, "doc_id", "text", index)
    stageJson(drop, "b0.json", 1700000000000L, Seq((2L, "blue fox"): (java.lang.Long, String)))
    stageJson(drop, "b1.json", 1700000060000L, Seq((3L, "green bird song"): (java.lang.Long, String)))
    runStream(drop, index)
    val all = base.unionByName(Seq((2L, "blue fox"), (3L, "green bird song"))
      .toDF("doc_id", "text"))
    val got = spark.read.parquet(index).select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    val scratch = InvertedIndex.buildScored(all, "doc_id", "text")
      .select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(got == scratch)
    // the sidecar carries the exact merged totals — the attach serves
    // rebuild-identical stats off disk alone
    assert(InvertedIndex.readTotals(index).contains((4L, 11L)))
    // full redelivery with a fresh checkpoint: the id screen drops every
    // row, nothing appends, totals unchanged
    runStream(drop, index)
    assert(spark.read.parquet(index).select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq == scratch,
      "redelivered stream must be an index no-op")
    assert(InvertedIndex.readTotals(index).contains((4L, 11L)))
  }

  test("a crashed append (marker present) fails the ingest loudly AT SUBMISSION, never screens over it") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-ixc-drop").toString
    val index = Files.createTempDirectory("graft-ixc-root").toString + "/postings"
    InvertedIndex.materializeScored(
      Seq((0L, "seed doc")).toDF("doc_id", "text"), "doc_id", "text", index)
    // simulate an append that died mid-flight: partial postings may be
    // visible, so continuing would silently drop that batch's docs.
    // start()'s preflight catches it BEFORE the stream wires up (the
    // r16 tripwire only fired at the NEXT micro-batch, leaving a window
    // where attach/search could read the partial index unchallenged)
    Files.write(java.nio.file.Paths.get(index, "._graft_bm25_appending"),
      Array.emptyByteArray)
    stageJson(drop, "b0.json", 1700000000000L, Seq((1L, "new doc"): (java.lang.Long, String)))
    val ex = intercept[IllegalArgumentException](runStream(drop, index))
    assert(ex.getMessage.contains("died mid-flight"), ex.getMessage)
  }

  test("a non-scored-layout artifact at indexPath names the contract, not a generic analysis error") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-ixw-drop").toString
    val index = Files.createTempDirectory("graft-ixw-root").toString + "/postings"
    // a MEMBERSHIP-layout artifact (no tf/dl) at the scored path — e.g. a
    // wrong path wiring — must fail with the layout message
    InvertedIndex.build(Seq((0L, "seed doc")).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(index)
    stageJson(drop, "b0.json", 1700000000000L, Seq((1L, "new doc"): (java.lang.Long, String)))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runStream(drop, index))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(c => Option(c.getMessage).exists(m =>
      m.contains("not a scored index artifact") && m.contains("tf, dl"))), ex.toString)
  }

  test("day-zero bootstrap, null ids excluded, null text a no-op, scheme'd path loud") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-ix0-drop").toString
    val index = Files.createTempDirectory("graft-ix0-root").toString + "/postings"
    stageJson(drop, "b0.json", 1700000000000L, Seq(
      (10L, "first ever document"): (java.lang.Long, String),
      (null: java.lang.Long, "orphan row without identity"),
      (11L, null: String)))
    runStream(drop, index)
    // only doc 10 contributes postings: the null-id row is excluded by
    // contract, the null-text row has no tokens (a rebuild would not
    // count it either)
    assert(spark.read.parquet(index).select("doc_id").distinct()
      .as[Long].collect().toSet == Set(10L))
    assert(InvertedIndex.readTotals(index).contains((1L, 3L)))
    // untokenizable rows are dropped BEFORE the screen, so a redelivery
    // of this batch is a TRUE no-op — no lock churn, no empty append
    // fragment, no sidecar-absent window (doc 11 never enters the index
    // so the id screen alone could not have protected it)
    def dataFiles() = new java.io.File(index).listFiles()
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val before = dataFiles()
    runStream(drop, index)
    assert(dataFiles() == before,
      "redelivery with untokenizable rows must not re-append")
    assert(InvertedIndex.readTotals(index).contains((1L, 3L)))
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
      .json(drop)
    val ex = intercept[IllegalArgumentException](
      graft.streaming.IndexIngest.start(stream, "doc_id", "text",
        "s3a://bucket/idx", "/tmp/ok-ckpt"))
    assert(ex.getMessage.contains("rename-atomic allowlist"), ex.getMessage)
  }

  test("file:-scheme'd index path runs the whole ingest through the Hadoop-backed io") {
    import java.nio.file.Files
    val drop = Files.createTempDirectory("graft-ixf-drop").toString
    val root = Files.createTempDirectory("graft-ixf-root").toString
    val index = "file:" + root + "/postings"
    stageJson(drop, "b0.json", 1700000000000L, Seq((0L, "red fox jumps"): (java.lang.Long, String)))
    stageJson(drop, "b1.json", 1700000060000L, Seq((1L, "blue fox"): (java.lang.Long, String)))
    runStream(drop, index)
    val scratch = InvertedIndex.buildScored(
        Seq((0L, "red fox jumps"), (1L, "blue fox")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(spark.read.parquet(index).select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq == scratch)
    // totals sidecar written through the Hadoop io, read back the same way
    assert(InvertedIndex.readTotals(index).contains((2L, 5L)))
    // redelivery with a fresh checkpoint: the id screen (reading the
    // file:-scheme'd artifact) drops everything — a true no-op
    runStream(drop, index)
    assert(InvertedIndex.readTotals(index).contains((2L, 5L)))
    assert(spark.read.parquet(index).select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq == scratch)
  }
}
