package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines.
  *
  * The reference has no scalar function library — all row logic is user
  * lambdas (SURVEY §2.7) — so these are engine-native additions. Every
  * function is built from `org.apache.spark.sql.functions._` (JVM-eval'd
  * higher-order functions, no Python/Scala UDFs), keeping the hot path
  * inside Catalyst so it survives a 100 TB scan: a per-row expression with
  * no shuffle, no driver involvement, and column pruning intact.
  */
object TextFunctions {

  /** Whitespace tokens (empty tokens removed). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length; null-safe for empty docs. */
  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(
        aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Count of tokens contained in `words` (stopword-list hit count). */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Share of tokens that are stopwords — a standard quality signal. */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(text, words).cast("double") / n)
  }

  /** Deterministic polynomial rolling hash over characters,
    * `acc = (acc * 31 + codepoint) mod 1e9+7` — a document fingerprint
    * reproducible in any engine with 64-bit integer arithmetic (the DuckDB
    * oracle replays it with `list_reduce`).
    */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  /** Overlapping word n-gram shingles (distinct), the MinHash input.
    * Guarded for docs shorter than n tokens (Spark's `sequence` would
    * otherwise generate a descending range).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = split(text, " ")
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(ts) - (n - 1)), i => array_join(slice(ts, i, lit(n)), " "))))
  }

  /** Overlapping character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), length(text) - (n - 1)), i => text.substr(i, lit(n)))))

  /** Exact Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ---- language identification (token-profile heuristic) ----

  /** Per-language stopword profiles. Deliberately small and fixed: the
    * heuristic is score = occurrences of the language's profile tokens,
    * argmax with a fixed priority tie-break — fully reproducible in SQL.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "los", "las", "y", "una", "es", "para", "como", "pero", "sus"),
    "fr" -> Seq("le", "les", "et", "est", "pour", "dans", "que", "qui", "pas", "vous"))

  /** Score columns for each profile, in [[langProfiles]] order. */
  def langScores(text: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, words) => lang -> stopwordCount(text, words) }

  /** Predicted language: first profile (in declaration order) whose score
    * is positive and >= all later profiles' scores; `und` when no profile
    * hits. The CASE chain is the spec — the oracle replays it verbatim.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val cols = scores.map(_._2)
    scores.zipWithIndex.foldRight(lit("und")) { case (((lang, s), i), elseCol) =>
      val geRest = cols.drop(i + 1).foldLeft(s > 0)((acc, other) => acc && s >= other)
      when(geRest, lit(lang)).otherwise(elseCol)
    }
  }

  /** Composite quality score in [0,1]:
    * `0.7 * min(n_tokens,100)/100 + 0.3 * en-stopword-ratio`, rounded to 4
    * decimals — a simple, reproducible stand-in for a trained quality
    * classifier.
    */
  def qualityScore(text: Column): Column = {
    val en = langProfiles.head._2
    round(
      least(tokenCount(text), lit(100)).cast("double") / 100 * 0.7 +
        stopwordRatio(text, en) * 0.3,
      4)
  }
}
