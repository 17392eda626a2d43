package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wordNGramsAll

/** Gopher-style repetition / quality statistics per document.
  *
  * The published heuristics for filtering machine-generated or
  * boilerplate-heavy text (Rae et al. 2021 "Gopher", Raffel et al.
  * 2020 "C4") key on REPETITION: the fraction of duplicate words, the
  * mass of the single most frequent word, and the mass of the most
  * frequent word bigram. This operator computes those plus mean word
  * length and a configurable keep decision.
  *
  * Scale shape: both unigram and bigram statistics are (doc, term)
  * hash aggregations with map-side partial aggregation — the shuffle
  * carries distinct (doc, term) pairs, never raw token instances, and
  * the two aggregate streams re-join on the doc id they are already
  * partitioned by. The bigram list comes from the single-scan
  * [[graft.functions.TextFunctions.WordNGrams]] codegen expression
  * (no window over exploded tokens, no second pass over the text).
  * All counts are integers, so every derived fraction is exactly
  * replayable by the oracle.
  */
object QualityFilters {

  /** Per-document repetition statistics.
    *
    * Output: id, n_words, dup_word_frac (1 - distinct/total),
    * top_word_frac (max unigram count / total), top_bigram_frac
    * (max bigram count / total bigrams; 0.0 for docs with < 2 words),
    * mean_word_len — fractions rounded to 4 decimals.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)

    val uni = df
      .select(id, explode(wordNGramsAll(col(textCol), 1)).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_cnt"),
        sum(length(col("w")) * col("c")).as("sum_len"))

    val bi = df
      .select(id, explode(wordNGramsAll(col(textCol), 2)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(sum("c").as("n_bigrams"), max("c").as("top_bi_cnt"))

    df.select(id)
      .join(uni, Seq(idCol), "left")
      .join(bi, Seq(idCol), "left")
      .select(
        id,
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        round(lit(1.0) - coalesce(col("n_distinct").cast("double") / col("n_words"), lit(1.0)), 4)
          .as("dup_word_frac"),
        round(coalesce(col("top_cnt").cast("double") / col("n_words"), lit(0.0)), 4)
          .as("top_word_frac"),
        round(coalesce(col("top_bi_cnt").cast("double") / col("n_bigrams"), lit(0.0)), 4)
          .as("top_bigram_frac"),
        round(coalesce(col("sum_len").cast("double") / col("n_words"), lit(0.0)), 4)
          .as("mean_word_len"))
  }

  /** The Gopher-style keep decision over [[repetitionStats]] output. */
  def keepDecision(maxDupWordFrac: Double, maxTopWordFrac: Double,
      maxTopBigramFrac: Double): Column =
    col("dup_word_frac") <= maxDupWordFrac &&
      col("top_word_frac") <= maxTopWordFrac &&
      col("top_bigram_frac") <= maxTopBigramFrac
}
