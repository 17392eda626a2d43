package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live ingestion — the Spark analog of the reference's `DSet.import`,
  * which sources a DSet from a service contract running on live nodes
  * (reference `src/CoreLib/DSetGenerics.fs:788-836`, contract import
  * `contractFSharp.fs:219-226`; paper §3.5/§6.2 builds its flagship
  * telemetry loop on it). Spark-first the "running service" is a
  * streaming source: a TCP endpoint emitting JSON events, or a drop
  * directory a producer appends files to. Downstream the frames feed the
  * same [[Telemetry]] / [[Sessionize]] pipelines as batch.
  *
  * Scale note: the socket source is single-connection (a demo/test
  * surface, like the reference's single-contract import); the directory
  * source is the production path — each micro-batch lists new files and
  * reads them with full parallelism, so ingest scales with the writer
  * fleet, not with one TCP pipe.
  */
object LiveIngest {

  /** Wire schema for live event lines (matches the `events` table columns
    * used by the telemetry pipelines).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  /** Source events from a live TCP endpoint emitting one JSON object per
    * line — the `import`-shaped case: the engine dials a running service
    * and scans whatever it serves.
    */
  def fromSocket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
      .select(from_json(col("value"), eventSchema).as("e"))
      // a garbled line (partial write, non-JSON noise) parses to a NULL
      // struct — dropped here, or it would splat to an all-NULL phantom
      // event and silently skew every downstream aggregate
      .filter(col("e").isNotNull)
      .select("e.*")

  /** Source events from a drop directory a live producer appends JSON
    * files to; each micro-batch picks up newly arrived files. This is the
    * scale path: file listing + parallel read per trigger.
    */
  def fromDirectory(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Minimal "running service" for demos/tests: serves the given lines to
    * every client that connects (a socket-source task retry or query
    * restart re-dials and replays the same lines rather than hanging on a
    * one-shot accept), holding each connection open until `close()` is
    * invoked. Returns (boundPort, closeFn). Pass port=0 to bind an
    * ephemeral port.
    */
  def serveLines(port: Int, lines: Seq[String]): (Int, () => Unit) = {
    val server = new ServerSocket(port)
    @volatile var done = false
    val t = new Thread(() => {
      while (!done) {
        try {
          val sock = server.accept()
          val conn = new Thread(() => {
            try {
              val out = new PrintWriter(sock.getOutputStream, true)
              lines.foreach(out.println)
              out.flush()
              while (!done) Thread.sleep(50)
            } catch { case _: Exception => () } // client went away
            finally { try sock.close() catch { case _: Exception => () } }
          }, "graft-live-ingest-conn")
          conn.setDaemon(true)
          conn.start()
        } catch {
          // server closed: shutting down. Any OTHER accept failure (e.g.
          // fd exhaustion) must not hot-spin the daemon thread — back off
          // briefly and retry.
          case _: Exception =>
            if (server.isClosed) done = true
            else try Thread.sleep(100) catch { case _: InterruptedException => done = true }
        }
      }
    }, "graft-live-ingest-server")
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, () => { done = true; try server.close() catch { case _: Exception => () } })
  }
}
