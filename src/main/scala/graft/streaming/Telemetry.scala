package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analog of the reference's live-telemetry niche.
  *
  * The reference has no watermark/window streaming; its streaming-shaped
  * capability is `DSet.import` of a live service contract re-scanned per
  * analytical cycle (reference `src/CoreLib/DSetGenerics.fs:788-836`,
  * paper §3.5/§6.2: a 10-minute sliding telemetry queue with sub-second
  * turnaround). Structured Streaming reproduces those semantics with
  * sliding windows + watermark; the same pipeline body runs in batch mode
  * for exact-parity checks (periodic batch re-execution is exactly the
  * reference's model).
  */
object Telemetry {

  /** Sliding-window stats over an event stream — the paper §6.2 pipeline
    * (percentile latency per window) re-expressed declaratively. Works on
    * both batch and streaming DataFrames; for streaming call through
    * [[slidingStatsStream]] so a watermark bounds state.
    *
    * Scale: one shuffle on (window, event_type); partial aggregation
    * happens map-side; percentile is exact (matches the oracle) — swap to
    * `percentile_approx` at 100 TB if the per-group value sets outgrow
    * memory.
    */
  def slidingStats(events: DataFrame, winDur: String, slideDur: String): DataFrame =
    events
      .groupBy(window(col("ts"), winDur, slideDur), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        round(percentile(col("value"), lit(0.95)), 4).as("p95_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("p95_value"))

  /** Streaming exactly-once event dedup: drop repeated ids within the
    * watermark horizon — the standard at-least-once → exactly-once
    * correction for event pipelines (state bounded by the watermark).
    * `dropDuplicatesWithinWatermark(id)` — NOT `dropDuplicates(id, ts)`,
    * which only collapses redeliveries that are byte-identical in ts: a
    * retried event restamped 1 ms later (broker ingestion time) would
    * pass straight through and double its downstream contribution.
    */
  def dedupStream(events: DataFrame, idCol: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(idCol)

  /** Watermarked stream-stream interval join: left events matched to
    * right events with the same key whose timestamp falls in
    * `[left.ts - beforeSec, left.ts]` — the streaming twin of
    * [[graft.operators.TemporalJoins.rangeJoin]] (spec asserts pair-set
    * parity with the batch form).
    *
    * Scale: both sides shuffle on the join key once; the time-range
    * predicate bounds each side's state to watermark + interval, so
    * state is O(rate × horizon) per key regardless of stream length.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
      watermark: String, beforeSec: Int): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(
      r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $beforeSec SECONDS") &&
        col("r.ts") <= col("l.ts"))
  }

  /** Streaming form: watermark bounds state for late data; append mode
    * emits a window once the watermark passes its end.
    */
  def slidingStatsStream(events: DataFrame, winDur: String, slideDur: String, watermark: String): DataFrame =
    // ONE aggregation body for both forms — the exact-parity premise of
    // this module; a second spelled-out copy could silently drift
    slidingStats(events.withWatermark("ts", watermark), winDur, slideDur)
}
