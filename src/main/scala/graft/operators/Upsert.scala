package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed corpus upsert (MERGE): replace-or-insert a batch into an
  * existing snapshot — the maintenance step between ingestion and the
  * incremental dedup family ([[Dedup.incrementalNearDupKeep]],
  * [[Dedup.incrementalExactKeep]]): rows whose key appears in the batch
  * take the batch version; all other existing rows survive; batch-only
  * keys insert.
  *
  * Scale shape: one key-partitioned anti-join (the batch side is the
  * daily increment — orders of magnitude smaller than the corpus, so AQE
  * broadcasts it and the corpus is never shuffled) + a union that
  * preserves the corpus's partitioning. For a 100 TB corpus where even a
  * broadcast-key anti-join scan is too hot, prune the corpus side first
  * with [[Dedup.exactKeyBloom]] (`might_contain` in the scan stage) so
  * only Bloom candidates reach the join — same pattern d13 gates.
  *
  * Precondition: `batch` has at most one row per key (dedupe the
  * increment first — `exactDedup` — otherwise both versions insert).
  */
object Upsert {

  def upsertByKey(existing: DataFrame, batch: DataFrame, keyCol: String): DataFrame =
    existing
      .join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(batch.select(existing.columns.map(col).toSeq: _*))
}
