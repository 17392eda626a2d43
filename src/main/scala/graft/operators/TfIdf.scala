package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics term weighting (TF-IDF) — the classic signal for
  * keyword extraction / topic filtering in a curation pipeline.
  *
  * Scale shape (narrow-first, r7): per-doc (term, tf) pairs come from
  * the native `TokenCountsScan` map expression + a narrow map-explode —
  * the r6 formulation's (doc, term) groupBy shuffle (which carried
  * every token instance's key) is gone. Plan-audited: one full-pair
  * exchange removed; local wall time is a WASH at 1×/10× (the
  * interpreted map expression trades CPU for the saved exchange —
  * worth it where shuffle is network-bound, neutral on local[32]).
  * The `tf` frame feeds two consumers (df agg + score join), so the
  * narrow scan runs twice — the same deliberate scans-for-shuffles
  * trade documented on `unigramLogProb`. Document frequency is one
  * (term) hash agg over those pairs — map-side combine shuffles
  * per-partition-distinct terms, vocabulary-sized — then the score join
  * (AQE broadcasts the vocab-sized df table) and the per-doc top-k
  * window (one shuffle on doc id, Spark 4's WindowGroupLimit keeps only
  * per-partition survivors). The corpus row count enters as a 1-row
  * aggregate cross join, never a driver action.
  *
  * Ranking is over the ROUNDED score with a term-name tiebreak so the
  * ordering is replayable in the DuckDB oracle to the last row.
  */
object TfIdf {

  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.tokenCounts(coalesce(col(textCol), lit(""))))
        .as(Seq("term", "tf")))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val n = df.agg(count(lit(1)).as("__n"))
    // broadcast the 1-row count frame explicitly: the Aggregate's size
    // estimate propagates from its corpus-sized child, so without the
    // hint the planner can pick CartesianProductExec for the corpus-sized
    // left side (same pattern as QualityFilters.unigramLogProb)
    val scored = tf.join(docFreq, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("__n") / col("df_t")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df_t"), col("rank"), col("score"))
  }
}
