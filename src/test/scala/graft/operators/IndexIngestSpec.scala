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
      rows: Seq[(java.lang.Long, String)]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val t = Files.createTempDirectory("graft-ix-b").toString
    rows.toDF("doc_id", "text").repartition(1).write.mode("overwrite").json(t)
    val part = new java.io.File(t).listFiles().filter(_.getName.endsWith(".json")).head.toPath
    val dst = Paths.get(dropDir, name)
    Files.move(part, dst, StandardCopyOption.ATOMIC_MOVE)
    Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtimeMs)): Unit
  }

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
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
      .json(drop)
    val ex = intercept[IllegalArgumentException](
      graft.streaming.IndexIngest.start(stream, "doc_id", "text",
        "hdfs://nn/idx", "/tmp/ok-ckpt"))
    assert(ex.getMessage.contains("scheme-less local-filesystem path"), ex.getMessage)
  }
}
