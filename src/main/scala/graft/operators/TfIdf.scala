package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics term weighting (TF-IDF) — the classic signal for
  * keyword extraction / topic filtering in a curation pipeline.
  *
  * Scale shape: tokenize (narrow) → tf aggregation (one shuffle on
  * (doc, term)) → document-frequency aggregation over the tf table (one
  * shuffle on term; input is already one row per (doc, term), so df is a
  * plain count) → score join (the df table is vocabulary-sized — AQE
  * broadcasts it) → per-doc top-k window (one shuffle on doc id). The
  * corpus row count enters as a 1-row aggregate cross join, never a
  * driver action.
  *
  * Ranking is over the ROUNDED score with a term-name tiebreak so the
  * ordering is replayable in the DuckDB oracle to the last row.
  */
object TfIdf {

  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(docFreq, "term").crossJoin(n)
      .withColumn("score", round(col("tf") * log(col("__n") / col("df_t")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df_t"), col("rank"), col("score"))
  }
}
