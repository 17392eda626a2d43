package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.InvertedIndex

/** Streaming maintenance of the SCORED (BM25) index — the continuous
  * closure of the ii family, [[ScreenedIngest]]'s twin on the retrieval
  * side (no reference counterpart): every micro-batch tokenizes ONLY
  * its own documents and folds them into the standing index artifact
  * via [[InvertedIndex.appendScored]], exact integer (N, avgdl) totals
  * included, so searches served off the artifact (attach, batched ii8
  * reads) stay CORRECT as the corpus streams in — never a stale-stats
  * mis-rank, never an O(index) rebuild per batch.
  *
  * Per-batch cost is batch-sized (tokenize + append + the sidecar fold)
  * plus, with `idScreen`, one column-pruned doc-id read of the index —
  * the one non-batch-sized term, same as [[ScreenedIngest]]'s screen.
  *
  * Identity contract (the ScreenedIngest convention): `idCol` is each
  * row's durable identity; NULL-id rows are excluded (no identity → no
  * idempotence story). Null/empty-TEXT rows contribute no postings and
  * no totals (a rebuild would not count them either), so they pass
  * through as no-ops.
  *
  * Redelivery (foreachBatch is at-least-once): `idScreen = true` (the
  * default) anti-joins each batch against the index's doc ids, so a
  * redelivered batch appends nothing. appendScored's own lock + marker
  * machinery covers crash windows WITHIN an append (a crash leaves no
  * sidecar — the next attach heals exactly). Disable `idScreen` only
  * when upstream guarantees globally-fresh ids AND exactly-once
  * delivery; without it a redelivered batch double-appends its postings
  * AND double-folds its totals (both wrong, loudly visible against a
  * rebuild — the ii5 oracle property).
  *
  * Day-zero bootstrap: a missing index directory simply starts the
  * artifact from zero (appendScored's `(0, 0)` prior) and skips the id
  * screen until the first batch lands. Writers elsewhere: appends to
  * one index path SERIALIZE under appendScored's advisory lock, but do
  * not run a second ingest against the same path — each ingest's id
  * screen only sees ids committed before its batch started.
  */
object IndexIngest {

  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, checkpointDir: String,
      idScreen: Boolean = true): StreamingQuery = {
    ArtifactPaths.requireLocal("IndexIngest", "indexPath", indexPath)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val admissible = batch.filter(col(idCol).isNotNull)
        val fresh = (
          if (idScreen && ArtifactPaths.hasParquet(indexPath))
            admissible.join(
              spark.read.parquet(indexPath).select(col(idCol)).distinct(),
              Seq(idCol), "left_anti")
          else admissible
        // frozen: the anti-join's plan reads the directory the append
        // mutates — materialize the kept set BEFORE writing (the
        // ScreenedIngest convention)
        ).localCheckpoint()
        try {
          // an all-screened (redelivered) batch must be a true no-op:
          // an empty append would still add a parquet fragment and
          // rewrite the sidecar for nothing
          if (!fresh.isEmpty) {
            InvertedIndex.appendScored(fresh, idCol, textCol, indexPath): Unit
          }
        } finally graftbridge.releaseCheckpoints(fresh)
      }
      .start()
  }
}
