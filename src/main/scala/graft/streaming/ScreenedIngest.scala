package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming ingest with an INLINE near-dup screen and sketch
  * maintenance — the closed incremental loop as one continuous pipeline
  * (no reference counterpart; the streaming composition of the r15
  * maintenance ops): every micro-batch screens against the CURRENT
  * SimHash sketch, kept rows land in the corpus, and the accepted batch
  * enters the sketch, so batch N+1 screens against everything admitted
  * through batch N — never a stale snapshot.
  *
  * Batch semantics (the d10 contract per micro-batch): cross-side
  * near-dups drop, within-batch dups pass (chain a batch-local
  * [[Dedup.nearDedupKeep]] upstream if needed). The SimHash sketch is
  * self-sufficient ([[Dedup.simhashSketch]]), so the screen reads no
  * corpus text — per-batch cost is batch-sized regardless of corpus
  * size, the property that lets this run as a CONTINUOUS query.
  *
  * The kept frame is eagerly `localCheckpoint`ed before either write:
  * the screen's plan READS `sketchPath`, and the sketch append WRITES
  * it — without the checkpoint the append job would re-evaluate the
  * screen against the directory it is mutating. The checkpoint also
  * freezes ONE kept set across the two writes; its blocks release at
  * the end of each batch (failure path included).
  *
  * Redelivery (foreachBatch is at-least-once): after BOTH writes
  * committed, a redelivered batch fully self-matches in the sketch and
  * appends nothing — net exactly-once. A crash BETWEEN the two writes
  * redelivers into a window where the corpus holds rows the sketch
  * doesn't know: those re-keep and append twice. Deployments that need
  * exactly-once through that window route the corpus write through the
  * versioned-table sink's batch-id tag ([[SnapshotSink]], the st3
  * machinery) or an id-keyed upsert ([[graft.operators.Upsert]]); the
  * sketch side needs nothing — re-appends are screen-idempotent
  * ([[graft.operators.SketchArtifact]]).
  */
object ScreenedIngest {

  def start(docs: DataFrame, idCol: String, textCol: String,
      sketchPath: String, corpusDir: String, checkpointDir: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val kept = Dedup.incrementalSimhashKeep(
            batch, spark.read.parquet(sketchPath), idCol, textCol,
            maxHamming, maxBucketSize)
          .localCheckpoint()
        try {
          // corpus first, then sketch: a crash between the two leaves
          // admitted-but-unscreenable rows that the redelivery re-keeps
          // (duplicate corpus rows an id-keyed sink collapses); the
          // reverse order would instead DROP the redelivered rows —
          // sketch-knows-but-corpus-missing is silent data loss
          kept.write.mode("append").parquet(corpusDir)
          Dedup.appendToSimhashSketch(kept, idCol, textCol, sketchPath)
        } finally graftbridge.releaseCheckpoints(kept)
      }
      .start()
}
