package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex-based text redaction (PII scrubbing) for corpus curation.
  *
  * A curation pipeline must strip personally identifying strings before
  * training (reference analog: the per-element rewrite stage of
  * `DSet.map`, `DSetGenerics.fs`; the patterns themselves follow the
  * public C4/CCNet-style scrub lists). Rules are an ORDERED list of
  * (regex, replacement): order matters because later patterns must not
  * re-match inside earlier replacements (an email contains digits a
  * phone pattern could otherwise claim), so application is sequential
  * and counting happens against the progressively redacted text —
  * exactly replayable by any regex engine with leftmost-first
  * non-overlapping semantics (java.util.regex here, RE2 in the DuckDB
  * oracle; the patterns avoid constructs where the two dialects
  * diverge: no backreferences, no lookaround).
  *
  * Scale shape: a narrow per-row projection in the scan stage — no
  * shuffle, no state, codegen'd `regexp_replace`/`regexp_count`.
  */
object Redact {

  /** Default PII rules: emails, then dashed phone numbers, then IPv4. */
  val PiiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+?\\d[\\d-]{6,}\\d", "<PHONE>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** The redacted text after applying `rules` in order. */
  def redacted(text: Column, rules: Seq[(String, String)] = PiiRules): Column =
    rules.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** Total number of redactions, counted per rule against the text as
    * already redacted by the PRECEDING rules (no double counting).
    */
  def redactionCount(text: Column, rules: Seq[(String, String)] = PiiRules): Column = {
    val (_, count) = rules.foldLeft((text, lit(0L))) {
      case ((c, n), (pat, rep)) =>
        (regexp_replace(c, pat, rep), n + regexp_count(c, lit(pat)).cast("long"))
    }
    count
  }

  /** Adds `redacted` + `n_redacted` columns for `textCol`. */
  def redact(df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = PiiRules): DataFrame =
    df.withColumn("redacted", redacted(col(textCol), rules))
      .withColumn("n_redacted", redactionCount(col(textCol), rules))
}
