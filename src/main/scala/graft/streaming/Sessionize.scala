package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state streaming
  * operator (`flatMapGroupsWithState`, the capability the reference's
  * mutable-service `KVStore` pattern approximates; reference
  * `ServiceLib/KVStore/KVSotre.fs:258-280`, paper §7).
  *
  * Two equivalent forms:
  *  - [[sessionsBatch]]: window functions (lag + running sum of
  *    gap-breaks) — one shuffle on user_id, SQL-replayable, used by the
  *    correctness oracle.
  *  - [[sessionsStream]]: event-time-timeout keyed state — emits a
  *    session when the watermark passes its gap. State per key is O(1)
  *    (running aggregates only), so 10^9 concurrent users fit executor
  *    memory at scale.
  */
object Sessionize extends Serializable {

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
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

  /** Microsecond precision helpers — `Timestamp.getTime` alone is
    * millisecond-truncating, which would make streamed session bounds
    * disagree with the batch form at µs precision.
    */
  private[streaming] def tsToMicros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
  private[streaming] def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming sessionization with event-time timeout: a session closes
    * (and is emitted) once the watermark passes `last event + gap`.
    * State timestamps are microseconds (matching the batch form's
    * `unix_micros` gap comparison exactly).
    */
  def sessionsStream(events: Dataset[SessionEvent], gapMinutes: Int, watermark: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60 * 1000000L

    def update(userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, microsToTs(s.start), microsToTs(s.end), s.n, s.sum))
      } else {
        val sorted = it.toSeq.sortBy(e => tsToMicros(e.ts))
        var closed = List.empty[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = tsToMicros(e.ts)
          cur match {
            case Some(s) if t - s.end <= gapUs =>
              cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1, sum = s.sum + e.value))
            case Some(s) =>
              closed ::= Session(userId, microsToTs(s.start), microsToTs(s.end), s.n, s.sum)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // timeout is wall-watermark domain (ms)
          state.setTimeoutTimestamp(s.end / 1000 + gapUs / 1000)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
