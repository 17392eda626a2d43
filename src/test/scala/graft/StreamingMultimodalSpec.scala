package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.multimodal.Multimodal
import graft.streaming.Telemetry

class StreamingMultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("multimodal roundtrip: decode recovers synthesized dimensions") {
    val docs = Tables.load(spark, sf0001, "documents")
    val decoded = Multimodal.decodeImages(Multimodal.synthesizeImages(docs, "doc_id")).collect()
    assert(decoded.length == 500)
    decoded.foreach { d =>
      assert(d.width == (16 + (d.doc_id * 7919) % 240).toInt)
      assert(d.height == (16 + (d.doc_id * 104729) % 240).toInt)
      assert(d.n_bytes == (12 + 64 + d.doc_id % 64).toInt)
    }
  }

  test("decodeImages rejects corrupt binary (bad magic)") {
    val bad = Seq((1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))).toDS()
    val ex = intercept[Exception] {
      Multimodal.decodeImages(bad).collect()
    }
    // assert on the root-cause CHAIN: Spark wraps executor failures in a
    // SparkException whose cause is always non-null, so an `|| getCause
    // != null` escape hatch would green-light ANY exception and never
    // pin the diagnostic error contract
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(c => Option(c.getMessage).exists(_.contains("unrecognized image bytes"))),
      s"expected 'unrecognized image bytes' in the cause chain, got: ${chain(ex).map(_.getMessage)}")
  }

  test("PNG decode: real ImageIO roundtrip recovers dims and exact pixels") {
    val ids = Seq(0L, 1L, 7L, 62L, 499L)
    val decoded = Multimodal.decodeImages(ids.map(id => (id, Multimodal.pngImageBytes(id))).toDS())
      .collect().map(d => d.doc_id -> d).toMap
    ids.foreach { id =>
      val d = decoded(id)
      val w = (8 + id % 9).toInt
      val h = (8 + (id / 9) % 7).toInt
      assert(d.width == w && d.height == h)
      val expectedSum = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(d.checksum == expectedSum, s"pixel sum mismatch for doc $id")
      assert(d.n_bytes > 8, "encoded PNG must be non-trivial")
    }
  }

  test("BMP decode: the second ImageIO format routes through the same decoder") {
    // encode the same deterministic raster as BMP — both lossless formats
    // must agree bit-for-bit on dims and pixel sum
    def bmpBytes(id: Long): Array[Byte] = {
      val w = (8 + id % 9).toInt
      val h = (8 + (id / 9) % 7).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val ids = Seq(3L, 42L)
    val viaPng = Multimodal.decodeImages(ids.map(id => (id, Multimodal.pngImageBytes(id))).toDS())
      .collect().map(d => d.doc_id -> (d.width, d.height, d.checksum)).toMap
    val viaBmp = Multimodal.decodeImages(ids.map(id => (id, bmpBytes(id))).toDS())
      .collect().map(d => d.doc_id -> (d.width, d.height, d.checksum)).toMap
    assert(viaPng == viaBmp)
  }

  test("resizeImages: nearest-neighbor half-scale, lossless re-encode, factor 1 is identity") {
    val ids = Seq(0L, 1L, 17L, 499L)
    val src = ids.map(id => (id, Multimodal.pngImageBytes(id))).toDS()
    val thumbs = Multimodal.decodeImages(Multimodal.resizeImages(src, 2))
      .collect().map(d => d.doc_id -> d).toMap
    ids.foreach { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id / 9) % 7).toInt
      val d = thumbs(id)
      assert(d.width == w / 2 && d.height == h / 2, s"doc $id thumb dims")
      // thumb pixel (x,y) must be SOURCE pixel (2x,2y) — wrong offset or
      // interpolation changes the sum
      val expected = (for (y <- 0 until h / 2; x <- 0 until w / 2)
        yield (id * 31 + (2 * x) * 7 + (2 * y) * 13) % 256).sum
      assert(d.checksum == expected, s"doc $id resampled pixel sum")
    }
    val same = Multimodal.decodeImages(Multimodal.resizeImages(src, 1))
      .collect().map(d => d.doc_id -> d.checksum).toMap
    val orig = Multimodal.decodeImages(src).collect().map(d => d.doc_id -> d.checksum).toMap
    assert(same == orig, "factor 1 must preserve every pixel")
  }

  test("frame sampling covers payload with stride") {
    val imgs = Multimodal.synthesizeImages(Tables.load(spark, sf0001, "documents").limit(10), "doc_id")
    val frames = Multimodal.sampleFrames(imgs, 16, 2).collect()
    assert(frames.nonEmpty)
    frames.foreach(r => assert(r.getAs[Int]("frame_idx") % 2 == 0))
  }

  test("featurizeImages: histogram sums to 1; header-only payload gives zero vector, not NaN") {
    import spark.implicits._
    val imgs = Seq(
      (1L, Multimodal.fakeImageBytes(1L)),
      (2L, Array.fill[Byte](12)(0))). // header only, empty payload
      toDS()
    val got = Multimodal.featurizeImages(imgs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(math.abs(got(1L).sum - 1.0) < 1e-12)
    assert(got(2L).forall(_ == 0.0), "empty payload must featurize to zeros")
    assert(got.values.forall(v => v.forall(x => !x.isNaN)))
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    // stage duplicated events: write the 200-row subset ONCE, then
    // duplicate by FILE COPY — two independent limit(200) jobs carry no
    // determinism guarantee and could stage different subsets (up to 400
    // distinct ids), flaking the exact-200 assertion below
    val dupDir = java.nio.file.Files.createTempDirectory("dedup-stream")
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    spark.read.parquet(s"$sf0001/events.parquet").limit(200)
      .write.mode("overwrite").parquet(dupDir.toString + "/a")
    val aDir = new java.io.File(dupDir.toString + "/a")
    aDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(aDir, "dup-" + f.getName).toPath)
    }
    val stream = Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(dupDir.toString + "/a"))
    val q = graft.streaming.Telemetry.dedupStream(stream, "event_id", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup")
      .start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "duplicates survived")
    assert(ids.length == 200, s"expected 200 unique events, got ${ids.length}")
  }

  test("streaming sliding stats ⊆ batch result; emitted windows match exactly") {
    val batchDf = Tables.load(spark, sf0001, "events")
    val batch = Telemetry.slidingStats(batchDf, "6 hours", "3 hours")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    // File-source streaming over the same parquet (staged into a dir —
    // the file source requires a directory), through the watermarked
    // streaming pipeline into a memory sink.
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      streamDir.resolve("events.parquet"))
    // stream with the RAW parquet schema; normalize ts with the same
    // type-driven branch Tables.load uses
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(streamDir.toString))
    val q = Telemetry.slidingStatsStream(stream, "6 hours", "3 hours", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("tele")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("tele").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    // Append mode withholds windows still above the final watermark, so
    // streamed ⊆ batch; every emitted window must match batch exactly.
    assert(streamed.nonEmpty, "streaming emitted no windows")
    streamed.foreach { case (k, v) =>
      assert(batch.contains(k), s"window $k not in batch result")
      assert(batch(k) == v, s"window $k: stream=$v batch=${batch(k)}")
    }
    assert(streamed.size >= batch.size / 2, s"too few windows emitted: ${streamed.size}/${batch.size}")
  }

  test("stream-stream interval join matches the batch range join pair-for-pair") {
    val ev = Tables.load(spark, sf0001, "events")
    val errorsB = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicksB = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val batchPairs = graft.operators.TemporalJoins
      .rangeJoin(errorsB, clicksB, "user_id", "ts", 300)
      .select(col("l.event_id"), col("click_id"))
      .filter(col("click_id").isNotNull) // rangeJoin is left_outer; stream join is inner
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val streamDir = java.nio.file.Files.createTempDirectory("join-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      streamDir.resolve("events.parquet"))
    val rawSchema = spark.read.parquet(s"$sf0001/events.parquet").schema
    def evStream = Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(streamDir.toString))
    val errorsS = evStream.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicksS = evStream.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val q = Telemetry.intervalJoinStream(errorsS, clicksS, "user_id", "10 minutes", 300)
      .select(col("l.event_id"), col("click_id"))
      .writeStream.outputMode("append").format("memory").queryName("sjoin")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamedPairs = spark.table("sjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedPairs == batchPairs,
      s"pair sets differ: stream-only=${(streamedPairs -- batchPairs).take(5)} " +
        s"batch-only=${(batchPairs -- streamedPairs).take(5)} " +
        s"(sizes ${streamedPairs.size} vs ${batchPairs.size})")
  }
}
