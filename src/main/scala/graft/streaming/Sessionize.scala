package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical stateful streaming operator
  * (the capability the reference's mutable-service `KVStore` pattern
  * approximates; reference `ServiceLib/KVStore/KVSotre.fs:258-280`,
  * paper §7).
  *
  * Two equivalent forms:
  *  - [[sessionsBatch]]: window functions (lag + running sum of
  *    gap-breaks) — one shuffle on user_id, SQL-replayable, used by the
  *    correctness oracle.
  *  - [[sessionsStream]]: Spark's native `session_window` state-store
  *    aggregation — emits a session when the watermark passes its close;
  *    open-session state per key is O(1) running aggregates, so 10^9
  *    concurrent users fit executor memory at scale, and the store's
  *    window-merge handles out-of-order arrivals across micro-batches.
  */
object Sessionize extends Serializable {

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Batch sessionization: session breaks where the gap to the previous
    * event of the same user exceeds `gapMinutes`; session id = running
    * count of breaks. Output: one row per session with start/end/count.
    */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // gap compare in microseconds: second-truncating functions would
      // disagree with the oracle on sub-second boundary gaps
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_break")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming sessionization on Spark's native `session_window`
    * aggregation: the state store MERGES overlapping per-event windows,
    * which handles out-of-order arrivals ACROSS micro-batches correctly —
    * an event above the watermark but older than the open session's start
    * extends (or splits) the session exactly as the batch form would. A
    * hand-rolled flatMapGroupsWithState keeping one (start, end) per key
    * cannot: it absorbed any above-watermark older event into the open
    * session without ever moving `start`, silently diverging from
    * [[sessionsBatch]].
    *
    * Gap parity: the batch form keeps diff == gap in the SAME session
    * (strict `>` split); `session_window` merges on window OVERLAP
    * (diff < gapDuration), so the duration carries one extra microsecond
    * — at µs timestamp granularity the two split conditions coincide.
    * Append mode emits a session once the watermark passes its close.
    */
  def sessionsStream(events: Dataset[SessionEvent], gapMinutes: Int, watermark: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes 1 microsecond"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
      .as[Session]
  }
}
