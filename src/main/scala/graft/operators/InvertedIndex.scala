package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted token index over a document corpus — the retrieval side of
  * curation recon: keyword search, contamination lookups ("which training
  * docs contain this eval phrase's tokens"), boilerplate investigation —
  * served from a materialized postings table instead of a full corpus
  * scan per probe.
  *
  * Scale shape: build is one explode + distinct-per-doc pass, written
  * once; every subsequent search is a FILTER ON THE TOKEN COLUMN of the
  * postings table — parquet row-group stats (or a token-bucketed layout
  * via [[graft.sources.Bucketing]] for repeated heavy use) prune to the
  * probed tokens, so a k-token query reads O(df(token)) postings, not
  * O(corpus) text. The AND-semantics group count shuffles only the
  * matching postings.
  */
object InvertedIndex {

  /** (token, doc_id) postings, one row per DISTINCT token per doc. */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(split(col(textCol), " "))).as("token"))
      .filter(length(col("token")) > 0)

  /** Materialize postings to `path` (the cross-run artifact) and reopen. */
  def materialize(docs: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame = {
    build(docs, idCol, textCol).write.mode("overwrite").parquet(path)
    docs.sparkSession.read.parquet(path)
  }

  /** Incremental maintenance: tokenize ONLY the new batch and append its
    * postings to the existing artifact — the index twin of the d10/d13
    * incremental-dedup shape (the corpus is never re-tokenized). Caller
    * contract: batch doc ids are new (run the batch through
    * [[Upsert.upsertByKey]] / dedup first), matching every append-only
    * postings store.
    */
  def appendTo(docs: DataFrame, idCol: String, textCol: String, path: String): Unit =
    build(docs, idCol, textCol).write.mode("append").parquet(path)

  /** Doc ids containing ALL of `tokens` (AND search): filter postings to
    * the probe set, count distinct probe tokens per doc, keep full
    * matches.
    */
  def searchAll(postings: DataFrame, idCol: String, tokens: Seq[String]): DataFrame = {
    require(tokens.nonEmpty, "searchAll needs at least one token")
    val probe = tokens.distinct // duplicate probes must not raise the match bar
    postings.filter(col("token").isin(probe: _*))
      .groupBy(col(idCol))
      .agg(count_distinct(col("token")).as("__nt"))
      .filter(col("__nt") === probe.length)
      .select(col(idCol))
  }

  /** Positional postings (token, doc_id, pos) over the empty-filtered
    * token sequence — the phrase-query form of [[build]]. `pos` is the
    * 0-based index in the filtered sequence, so adjacency (`pos + 1`)
    * means "next word".
    */
  def buildPositional(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(filter(split(col(textCol), " "), t => length(t) > 0))
        .as(Seq("pos", "token")))

  /** Materialize positional postings to `path` and reopen. */
  def materializePositional(docs: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame = {
    buildPositional(docs, idCol, textCol).write.mode("overwrite").parquet(path)
    docs.sparkSession.read.parquet(path)
  }

  /** Doc ids containing the exact phrase — `phrase` tokens adjacent in
    * order. Each probe filters the postings to ONE token (O(df) rows
    * read), then adjacency folds as equi-joins on (doc, pos offset):
    * candidate count shrinks with every join, and the corpus text is
    * never touched.
    */
  def searchPhrase(postings: DataFrame, idCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "searchPhrase needs at least one token")
    val first = postings.filter(col("token") === phrase.head)
      .select(col(idCol), col("pos"))
    phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(
        postings.filter(col("token") === w)
          .select(col(idCol).as("__id2"), (col("pos") - i).as("__p2")),
        col(idCol) === col("__id2") && col("pos") === col("__p2"))
        .select(col(idCol), col("pos"))
    }.select(col(idCol)).distinct()
  }

  /** Top-k tokens by document frequency (tiebreak token asc) — the
    * deterministic probe-selection helper the ii1 gate uses. Driver
    * collect of k rows is the intended boundary.
    */
  def topTokensByDf(postings: DataFrame, k: Int): Seq[String] =
    postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)
      .collect()
      .map(_.getString(0))
      .toSeq

  /** The corpus's top document-frequency n-gram (ties broken gram asc),
    * split into its tokens — the deterministic phrase-probe selector
    * SHARED by the ii2 gate and the bench steady-state twin, so probe
    * selection cannot silently de-synchronize between the gate's
    * semantics and the steady-state measurement. Driver collect of one
    * row is the intended boundary; fails loudly on a corpus with no
    * n-token document instead of a bare ArrayIndexOutOfBounds.
    */
  def topGramByDf(docs: DataFrame, textCol: String, n: Int): Seq[String] = {
    val rows = docs
      .select(explode(graft.functions.TextFunctions.tokenGramCounts(col(textCol), n))
        .as(Seq("g", "cd")))
      .groupBy("g").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("g").asc)
      .limit(1).collect()
    require(rows.nonEmpty,
      s"topGramByDf: no document holds an $n-token gram (empty or too-short corpus)")
    rows(0).getString(0).split(" ").toSeq
  }

  /** Convenience: build-or-attach via the cross-session plan cache. */
  def attach(docs: DataFrame, idCol: String, textCol: String,
      cacheDir: String): DataFrame =
    graft.sources.PlanCache.readThrough(build(docs, idCol, textCol), cacheDir)
}
