package graft.examples

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{GraftSession, Tables}
import graft.streaming.{LiveIngest, Telemetry}

/** End-to-end live telemetry loop — the reference's flagship scenario
  * (paper §6.2: a sliding-window telemetry queue sourced from a running
  * service via `DSet.import`, reference `DSetGenerics.fs:788-836`).
  *
  * A local TCP "service" serves the events table as JSON lines; the
  * engine dials it with [[LiveIngest.fromSocket]] and runs the
  * watermarked sliding-stats pipeline, printing each emitted window.
  *
  * Run: `sbt "runMain graft.examples.LiveTelemetryDemo [sfDir]"`
  */
object LiveTelemetryDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)

    val lines = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .toJSON.collect().toSeq
    val (port, close) = LiveIngest.serveLines(0, lines)
    println(s"[demo] serving ${lines.size} events on localhost:$port")

    val stream = LiveIngest.fromSocket(spark, "localhost", port)
    val q = Telemetry.slidingStatsStream(stream, "6 hours", "3 hours", "10 minutes")
      .writeStream.outputMode("append").format("console")
      .option("truncate", "false")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (System.currentTimeMillis() < deadline) { q.processAllAvailable(); Thread.sleep(500) }
    } finally {
      q.stop(); close(); spark.stop()
    }
  }
}
