package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{LiveIngest, Telemetry}

/** Live-ingestion specs for the `DSet.import` analog (reference
  * `DSetGenerics.fs:788-836`): the stream is fed by an external producer
  * that is actually running WHILE the query executes — a TCP service and
  * an incremental file-drop — and the streamed result must equal the
  * batch pipeline on the same data.
  */
class LiveIngestSpec extends SparkSuite {
  import spark.implicits._

  /** events of sf0.001 as batch frame + its JSON-line wire form. */
  private lazy val eventsBatch = {
    Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
  }
  // serialized in ts order: the socket test's 10-minute watermark treats
  // anything older than max-seen-ts minus the delay as late data, so an
  // unordered wire feed (the driver owns the parquet row order and has
  // re-encoded it across rounds) would silently drop rows and fail the
  // parity assertion as if the operator were broken
  private lazy val eventLines: Seq[String] =
    eventsBatch.orderBy(col("ts")).toJSON.collect().toSeq

  private def statsKeyed(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("socket import: live TCP service feeds sliding stats equal to batch") {
    val (port, close) = LiveIngest.serveLines(0, eventLines)
    try {
      val stream = LiveIngest.fromSocket(spark, "localhost", port)
      val q = Telemetry.slidingStatsStream(stream, "6 hours", "3 hours", "10 minutes")
        .writeStream.outputMode("append").format("memory").queryName("live_sock")
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()
      try {
        // wait until the socket reader has drained all lines into batches
        val deadline = System.nanoTime() + 120e9.toLong
        var seen = -1L
        var stable = 0
        while (stable < 4 && System.nanoTime() < deadline) {
          q.processAllAvailable()
          val n = Option(q.lastProgress).map(_.stateOperators.headOption.map(_.numRowsTotal).getOrElse(0L)).getOrElse(0L)
          if (n == seen && n > 0) stable += 1 else { stable = 0; seen = n }
          Thread.sleep(250)
        }
        q.processAllAvailable()
      } finally q.stop()

      val batch = statsKeyed(Telemetry.slidingStats(eventsBatch, "6 hours", "3 hours"))
      val streamed = statsKeyed(spark.table("live_sock"))
      assert(streamed.nonEmpty, "no windows emitted from the socket stream")
      streamed.foreach { case (k, v) =>
        assert(batch.contains(k), s"window $k not in batch result")
        assert(batch(k) == v, s"window $k: stream=$v batch=${batch(k)}")
      }
      assert(streamed.size >= batch.size / 2, s"too few windows: ${streamed.size}/${batch.size}")
    } finally close()
  }

  test("file-drop import: producer appending chunks mid-query; dedup + parity") {
    val dir = Files.createTempDirectory("live-drop").toString
    // split the wire lines into 4 chunks; drop chunk 0 before start, the
    // rest from a producer thread while the query runs — each chunk is
    // also written TWICE so the exactly-once dedup has real work
    val chunks = eventLines.grouped(math.max(1, eventLines.size / 4 + 1)).toSeq
    def drop(i: Int): Unit = {
      // stage outside the watched dir, then move in atomically — the file
      // source can list a file mid-write otherwise (partial JSON lines)
      val tmp = Files.createTempFile("live-drop-stage", ".json")
      val dup = chunks(i) ++ chunks(i) // at-least-once delivery simulated
      Files.write(tmp, dup.mkString("\n").getBytes)
      Files.move(tmp, java.nio.file.Paths.get(dir, f"chunk_$i%02d.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    drop(0)

    val stream = LiveIngest.fromDirectory(spark, dir, maxFilesPerTrigger = 1)
    // 90-day watermark (> the fixture's 30-day ts span): no row can be
    // dropped as late whatever order the driver encoded the parquet in,
    // and redelivered ids stay IN the dedup state for the whole run so
    // the cross-batch redelivery below is genuinely deduped by state
    val deduped = Telemetry.dedupStream(stream, "event_id", "90 days")
    val q = deduped
      .writeStream.outputMode("append").format("memory").queryName("live_drop")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    val producer = new Thread(() => {
      (1 until chunks.size).foreach { i => Thread.sleep(700); drop(i) }
      // REDELIVER chunk 0 as its own later file: with maxFilesPerTrigger=1
      // the within-file duplicates above always land in one micro-batch,
      // so only this cross-batch replay proves the KEYED STATE dedups
      // across triggers (a per-batch-only distinct would re-emit these)
      Thread.sleep(700)
      val tmp = Files.createTempFile("live-drop-stage", ".json")
      Files.write(tmp, chunks(0).mkString("\n").getBytes)
      Files.move(tmp, java.nio.file.Paths.get(dir, "chunk_redelivery.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }, "graft-live-drop-producer")
    producer.start()
    try {
      producer.join()
      q.processAllAvailable()
    } finally q.stop()

    val gotIds = spark.table("live_drop").select("event_id").as[Long].collect().sorted
    val wantIds = eventsBatch.select("event_id").as[Long].collect().sorted
    assert(gotIds.length == gotIds.distinct.length, "duplicates survived the dedup")
    assert(gotIds.toSeq == wantIds.toSeq, s"streamed ids != batch ids (${gotIds.length} vs ${wantIds.length})")
    // the producer really interleaved with execution: >1 micro-batch read files
    assert(q.recentProgress.count(_.numInputRows > 0) > 1, "expected multiple non-empty micro-batches")
  }
}
