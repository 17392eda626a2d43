package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-set decontamination: find (and drop) training documents that
  * share any word n-gram with a held-out evaluation set — the standard
  * benchmark-leakage guard run before every serious pretraining job.
  *
  * Scale shape: both corpora stream through a narrow tokenize+n-gram
  * pass; the only shuffle is the gram equi-join. Eval sets are tiny
  * relative to training corpora, so AQE broadcasts the distinct eval
  * grams (no hint forced — a pathological eval set degrades to a
  * shuffle join, never a driver collect). Flag counts aggregate on doc
  * id, ∝ contaminated docs only.
  */
object Decontaminate {

  /** Distinct space-joined word `n`-grams per row; rows with fewer than
    * `n` tokens contribute none. Native single-scan expression
    * ([[graft.functions.TextFunctions.WordNGrams]]) — the HOF
    * formulation (`transform(sequence, i => array_join(slice))`)
    * interpreted four nested lambdas per gram and dominated the 10×
    * probe (13.8 s → see BASELINE.md).
    */
  private def gramsCol(textCol: Column, n: Int): Column =
    graft.functions.TextFunctions.wordNGrams(textCol, n)

  /** Contamination report: one row per training doc sharing at least one
    * n-gram with the eval set, with the count of distinct shared grams.
    */
  def contaminationReport(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val trainGrams = train
      .select(col(idCol), explode(gramsCol(col(textCol), n)).as("gram"))
    val evalGrams = eval
      .select(explode(gramsCol(col(textCol), n)).as("gram")).distinct()
    trainGrams.join(evalGrams, "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
  }

  /** EVAL-side contamination audit: for each eval doc, the fraction of
    * its distinct n-grams that appear ANYWHERE in the training corpus —
    * the published per-example "dirty fraction" (the GPT-3 appendix-C /
    * PaLM decontamination audit convention: examples above a dirty
    * threshold are excluded from reported-clean splits). Complements
    * [[contaminationReport]]'s train-side view — that one asks "which
    * training docs leak the benchmark", this one asks "how compromised
    * is each benchmark example".
    *
    * Scale shape: the training corpus streams through one narrow
    * tokenize+n-gram pass and deduplicates grams BEFORE the join (the
    * only corpus-sized shuffle); eval grams are tiny, so AQE broadcasts
    * them into the probe join, whose output is bounded by eval grams.
    * Eval docs with fewer than `n` tokens report n_grams = 0 with a NULL
    * dirty_frac — undefined, never silently 0 ("clean") or dropped.
    */
  def evalContamination(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val evalGrams = eval
      .select(col(idCol), explode(gramsCol(col(textCol), n)).as("gram"))
    val trainGrams = train
      .select(explode(gramsCol(col(textCol), n)).as("gram")).distinct()
    val totals = evalGrams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    // train side distinct per gram + eval side distinct per (doc, gram)
    // → the inner join emits exactly one row per hit
    val hits = trainGrams.join(evalGrams, "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    eval.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_grams"), 6).as("dirty_frac"))
  }

  /** The cleaned training corpus: contaminated docs anti-joined away. */
  def decontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val flagged = contaminationReport(train, eval, idCol, textCol, n)
      .select(col(idCol).as("__contaminated_id"))
    train.join(flagged, col(idCol) === col("__contaminated_id"), "left_anti")
  }
}
