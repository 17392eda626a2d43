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

  /** The cleaned training corpus: contaminated docs anti-joined away. */
  def decontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val flagged = contaminationReport(train, eval, idCol, textCol, n)
      .select(col(idCol).as("__contaminated_id"))
    train.join(flagged, col(idCol) === col("__contaminated_id"), "left_anti")
  }
}
