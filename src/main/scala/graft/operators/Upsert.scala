package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed corpus upsert (MERGE): replace-or-insert a batch into an
  * existing snapshot — the maintenance step between ingestion and the
  * incremental dedup family ([[Dedup.incrementalNearDupKeep]],
  * [[Dedup.incrementalExactKeep]]): rows whose key appears in the batch
  * take the batch version; all other existing rows survive; batch-only
  * keys insert. Keys are composite (`Seq[String]`) — real corpora key on
  * (source, doc_id), not a single column; single-column overloads remain
  * for the common case.
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

  def upsertByKey(existing: DataFrame, batch: DataFrame, keyCols: Seq[String]): DataFrame =
    existing
      .join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(batch.select(existing.columns.map(col).toSeq: _*))

  def upsertByKey(existing: DataFrame, batch: DataFrame, keyCol: String): DataFrame =
    upsertByKey(existing, batch, Seq(keyCol))

  /** The 100 TB tier of [[upsertByKey]]: a Bloom filter over the BATCH
    * keys (increment-sized, built once) pre-prunes the corpus in the
    * scan stage — rows whose key cannot be in the batch (`might_contain`
    * of the composite-key xxhash64 false) pass straight through without
    * ever reaching the anti-join; only Bloom candidates (true
    * replacements + fpp·corpus false positives) pay the join. Same d13
    * machinery, replace direction. Result is EXACT (the anti-join
    * re-checks candidates on the real key columns); the Bloom only
    * decides who gets joined.
    */
  def upsertByKeyBloom(existing: DataFrame, batch: DataFrame, keyCols: Seq[String],
      fpp: Double): DataFrame = {
    val bloom = Dedup.exactKeyBloom(batch, keyCols, fpp = fpp)
    val probe = Dedup.bloomMightContain(bloom, keyCols)
    existing.filter(!probe)
      .unionByName(
        existing.filter(probe)
          .join(batch.select(keyCols.map(col): _*), keyCols, "left_anti"))
      .unionByName(batch.select(existing.columns.map(col).toSeq: _*))
  }

  def upsertByKeyBloom(existing: DataFrame, batch: DataFrame, keyCols: Seq[String]): DataFrame =
    upsertByKeyBloom(existing, batch, keyCols, 0.01)

  def upsertByKeyBloom(existing: DataFrame, batch: DataFrame, keyCol: String,
      fpp: Double = 0.01): DataFrame =
    upsertByKeyBloom(existing, batch, Seq(keyCol), fpp)
}
