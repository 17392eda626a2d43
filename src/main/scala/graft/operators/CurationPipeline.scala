package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline a training-data job actually
  * ships: near-dedup → cross-doc boilerplate removal → emptiness filter
  * → stratified resampling → sequence packing, composed as ONE lazy
  * Spark plan (a single action executes the whole thing; Catalyst sees
  * and optimizes across every stage boundary).
  *
  * Stage order is load-bearing: dedup FIRST so duplicate clusters don't
  * inflate line document-frequencies (a 5000-copy boilerplate page would
  * otherwise vote 5000 times), boilerplate removal before sampling so
  * rates apply to the cleaned population, packing LAST over the cleaned
  * token counts.
  *
  * Scale: the stages are the audited operators ([[Dedup.nearDedupKeep]],
  * [[Dedup.removeRepeatedLines]], [[Sampling.stratifiedHashSample]],
  * [[Packing.packChunks]]) — nothing new moves; see SCALING.md rows.
  */
object CurationPipeline {

  /** @param docs        corpus with id/text/stratum/shard columns
    * @param rates       per-stratum sampling rates (missing → drop)
    * @param capacity    context-window size in tokens (post-cleaning)
    * @param delim       boilerplate unit separator — "\n" removes repeated
    *                    LINES (the documented 5000-copy-page case); pass
    *                    " " only for single-line corpora where the unit is
    *                    the word (a word-level delim on multi-line text
    *                    turns the stage into corpus-wide stopword deletion)
    * @return one row per surviving doc:
    *         (idCol, shardCol, stratumCol, n_kept, bin, offset)
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      stratumCol: String, shardCol: String,
      rates: Seq[(String, Double)], seed: Long,
      maxDocFrac: Double = 0.5, capacity: Long = 128L,
      delim: String = "\n",
      bands: Int = Dedup.AutoBands): DataFrame = {
    val kept = Dedup.nearDedupKeep(docs, idCol, textCol, bands = bands)
    val cleaned = Dedup.removeRepeatedLines(kept, idCol, textCol, delim, maxDocFrac)
    // recover stratum/shard from `docs`, not `kept`: cleaned's id set
    // equals kept's (removeRepeatedLines preserves cardinality), so the
    // inner join yields identical rows either way — joining `kept` would
    // re-execute the nearDedupKeep scan + anti-join subtree a fourth time
    val enriched = cleaned
      .join(docs.select(col(idCol), col(stratumCol), col(shardCol)), idCol)
      .filter(col("n_kept") >= 1)
    val sampled = Sampling.stratifiedHashSample(
      enriched.select(col(idCol), col(shardCol), col(stratumCol), col("n_kept")),
      idCol, stratumCol, rates, defaultRate = 0.0, seed = seed)
    Packing.packChunks(sampled, shardCol, idCol, "n_kept", capacity)
  }
}
