package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.repetitionScan

/** Gopher-style repetition / quality statistics per document.
  *
  * The published heuristics for filtering machine-generated or
  * boilerplate-heavy text (Rae et al. 2021 "Gopher", Raffel et al.
  * 2020 "C4") key on REPETITION: the fraction of duplicate words, the
  * mass of the single most frequent word, and the mass of the most
  * frequent word bigram. This operator computes those plus mean word
  * length and a configurable keep decision.
  *
  * Scale shape: the signals are PER-DOCUMENT, so nothing ever needs to
  * shuffle — all six counters come from one narrow pass per row
  * ([[graft.functions.TextFunctions.RepetitionScan]], a per-row hash
  * map bounded by document length). The earlier explode → (doc, term)
  * groupBy → join formulation moved every distinct term occurrence in
  * the corpus through two shuffles to compute row-local counts; the
  * narrow form measured ~8× faster at both sf0.1 and 10× (0.35 s /
  * 0.86 s vs 3.11 s / 6.60 s), and at 100 TB it is the difference
  * between a map-only stage and corpus-sized exchanges.
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
    val r = col("__rep")
    df.select(col(idCol), repetitionScan(coalesce(col(textCol), lit(""))).as("__rep"))
      .select(
        col(idCol),
        r.getField("n_words").as("n_words"),
        when(r.getField("n_words") === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            r.getField("n_distinct").cast("double") / r.getField("n_words"), 4))
          .as("dup_word_frac"),
        when(r.getField("n_words") === 0, lit(0.0))
          .otherwise(round(r.getField("top_cnt").cast("double") / r.getField("n_words"), 4))
          .as("top_word_frac"),
        when(r.getField("n_bigrams") === 0, lit(0.0))
          .otherwise(round(r.getField("top_bi_cnt").cast("double") / r.getField("n_bigrams"), 4))
          .as("top_bigram_frac"),
        when(r.getField("n_words") === 0, lit(0.0))
          .otherwise(round(r.getField("sum_len").cast("double") / r.getField("n_words"), 4))
          .as("mean_word_len"))
  }

  /** Per-document average unigram log-probability under a language model
    * estimated from the corpus itself — the perplexity-style quality
    * signal (CCNet scores against a KenLM; a corpus-trained unigram LM is
    * its reproducible, oracle-replayable core). Low scores flag docs
    * whose vocabulary is unusual for the corpus (spam, encoding damage,
    * wrong language).
    *
    * Shape (narrow-first): per-document token counts come from the
    * native [[graft.functions.TextFunctions.TokenCountsScan]] map
    * expression plus a narrow map-explode — so NOTHING corpus-sized
    * ever shuffles. The `docTok` frame feeds two consumers (vocab agg +
    * scoring join), so the narrow scan/explode runs twice — deliberate:
    * narrow scans are I/O-linear and fully parallel, while persisting
    * per-doc counts corpus-wide would spill at the design scale, and
    * the r6/first-r7 alternatives paid corpus-sized SHUFFLES (the
    * scarce resource) to avoid the second scan. The LM is a (token) agg of
    * those counts — map-side combine shuffles per-partition-distinct
    * tokens only, vocabulary-sized output (Heaps' law: ≪ corpus) — with
    * the token total riding along as a 1-row cross join; scoring joins
    * the counts back on token (AQE broadcasts the vocab side while it
    * fits; at extreme vocabularies it degrades to a shuffle join, never
    * a driver collect) and one (doc) agg computes the count-weighted
    * mean — identical to the per-instance avg.
    *
    * Output: id, n_tokens, avg_logprob = avg(ln(count(t)/N)) over token
    * instances (computed as Σ cd·ln(c/N) / Σ cd) rounded to 4 decimals
    * (0.0 for empty docs), ascending = more surprising.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docTok = df
      .select(col(idCol).as("__id"),
        explode(graft.functions.TextFunctions.tokenCounts(coalesce(col(textCol), lit(""))))
          .as(Seq("t", "cd")))
    val vocab = docTok.groupBy("t").agg(sum("cd").as("c"))
    val total = vocab.agg(sum("c").as("n"))
    val scored = docTok
      .join(vocab, "t")
      .crossJoin(broadcast(total))
      .groupBy("__id")
      .agg(sum("cd").as("n_tokens"),
        round(sum(col("cd").cast("double") * log(col("c").cast("double") / col("n")))
          / sum("cd").cast("double"), 4).as("avg_logprob"))
    df.select(col(idCol))
      .join(scored, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** CCNet-style perplexity bucketing: rank each stratum's documents by
    * the [[unigramLogProb]] quality score (higher = less surprising
    * under the corpus LM) and cut the ranking into labeled fractions —
    * the head/middle/tail split CCNet curates with, here against the
    * corpus-trained unigram LM so any engine can replay the boundary.
    * Composition of the f3 score pass and [[bucketByScore]]; documents
    * with no tokens carry no evidence and land in the LAST bucket
    * without consuming a rank slot.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, cutsMicros: Seq[Long] = Seq(333333L, 666667L),
      labels: Seq[String] = Seq("head", "middle", "tail")): DataFrame = {
    val (scored, empties) = lmScored(df, idCol, textCol, stratumCol)
    bucketByScore(scored, idCol, stratumCol, "avg_logprob", cutsMicros, labels)
      .unionByName(empties(labels.last))
  }

  /** The sketch-boundary composition — [[unigramLogProb]] scores into
    * [[bucketByScoreApprox]]; same labels/fractions/tokenless handling
    * as [[perplexityBuckets]], boundary placement approximate within the
    * sketch accuracy (which is why the EXACT form is what the oracle
    * gates).
    */
  def perplexityBucketsApprox(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, cutsMicros: Seq[Long] = Seq(333333L, 666667L),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      accuracy: Int = 10000): DataFrame = {
    val (scored, empties) = lmScored(df, idCol, textCol, stratumCol)
    bucketByScoreApprox(scored, idCol, stratumCol, "avg_logprob", cutsMicros, labels,
        accuracy)
      .unionByName(empties(labels.last))
  }

  /** The shared f3 score pass: (id, stratum, avg_logprob) for documents
    * WITH tokens, plus a thunk producing the tokenless rows for a given
    * last-bucket label. Tokenless docs are decided by a narrow
    * emptiness scan — running the LM pipeline for rows whose score is
    * definitionally 0.0 would pay the vocab shuffle a second time
    * (union branches don't share plans).
    */
  private def lmScored(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String): (DataFrame, String => DataFrame) = {
    val hasTok = size(filter(split(coalesce(col(textCol), lit("")), " "),
      t => t =!= "")) > 0
    val scored = df.filter(hasTok).select(col(idCol), col(stratumCol))
      .join(unigramLogProb(df.filter(hasTok), idCol, textCol), idCol)
      .select(col(idCol), col(stratumCol), col("avg_logprob"))
    val empties = (last: String) => df.filter(!hasTok)
      .select(col(idCol), col(stratumCol), lit(last).as("bucket"),
        lit(0.0).as("avg_logprob"))
    (scored, empties)
  }

  private def validateCuts(cutsMicros: Seq[Long], labels: Seq[String]): Unit = {
    require(labels.size == cutsMicros.size + 1,
      s"need one label per cut plus a final bucket: ${cutsMicros.size} cuts, ${labels.size} labels")
    require(cutsMicros.forall(c => c > 0 && c < 1000000L) &&
        (cutsMicros.size < 2 || cutsMicros.sliding(2).forall(p => p.head < p.last)),
      s"cuts must be strictly inside (0, 10^6) and STRICTLY ascending (a duplicate " +
        s"cut would shadow its label), got $cutsMicros")
  }

  /** EXACT fraction boundary over a precomputed (id, stratum, score)
    * frame: doc in bucket i iff `rank · 10^6 ≤ n_stratum · cutMicros(i)`
    * (rank is dense 1-based per stratum over (score DESC, id ASC) — with
    * a rounded score, ties are REAL and the id tiebreak, not float
    * noise, decides them). Separated from the scoring pass so callers
    * can bucket ANY quality signal (classifier margin, length, the f3
    * LM) and reuse one scored artifact across cut configurations.
    *
    * Scale shape: one per-stratum window sort (the q7 range-shuffle
    * class) plus a broadcast of per-stratum counts — the sort is the
    * whole cost, which is what [[bucketByScoreApprox]] removes.
    */
  def bucketByScore(df: DataFrame, idCol: String, stratumCol: String,
      scoreCol: String, cutsMicros: Seq[Long], labels: Seq[String]): DataFrame = {
    validateCuts(cutsMicros, labels)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col(scoreCol).desc, col(idCol).asc)
    // null-safe stratum match (the mixtureSample convention: null is a
    // stratum like any other — a USING join would silently drop it)
    val counts = df.groupBy(col(stratumCol).as("__stratum")).agg(count(lit(1)).as("__n"))
    val bucket = cutsMicros.zip(labels.init).foldRight(lit(labels.last)) {
      case ((cut, label), rest) =>
        when(col("__rn") * 1000000L <= col("__n") * cut, label).otherwise(rest)
    }
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(counts), col(stratumCol) <=> col("__stratum"))
      .select(col(idCol), col(stratumCol), bucket.as("bucket"), col(scoreCol))
  }

  /** SKETCH fraction boundary over a precomputed (id, stratum, score)
    * frame — the 100 TB operating point: per-stratum thresholds from
    * `percentile_approx` (one map-side-combined sketch agg,
    * stratum-count-sized output) and bucketing as a broadcast threshold
    * join + a scan-stage comparison — no corpus-sized sort anywhere.
    * Bucket rule: with cuts c₁ < c₂ < …, a doc is in bucket i when its
    * score ≥ the stratum's (1 − cᵢ) quantile (higher score = better =
    * earlier bucket), else the last label. Boundary placement is
    * approximate within the sketch `accuracy` (1/accuracy relative rank
    * error) — rows within that band of a cut may land one bucket off
    * the exact form, the standard sketch trade.
    */
  def bucketByScoreApprox(df: DataFrame, idCol: String, stratumCol: String,
      scoreCol: String, cutsMicros: Seq[Long], labels: Seq[String],
      accuracy: Int = 10000): DataFrame = {
    validateCuts(cutsMicros, labels)
    val qs = cutsMicros.map(c => 1.0 - c.toDouble / 1000000.0)
    val thrs = df.groupBy(col(stratumCol).as("__stratum")).agg(
      percentile_approx(col(scoreCol),
        array(qs.map(lit(_)): _*), lit(accuracy)).as("__thrs"))
    val bucket = cutsMicros.indices.zip(labels.init).foldRight(lit(labels.last)) {
      case ((i, label), rest) =>
        when(col(scoreCol) >= col("__thrs").getItem(i), label).otherwise(rest)
    }
    df.join(broadcast(thrs), col(stratumCol) <=> col("__stratum"))
      .select(col(idCol), col(stratumCol), bucket.as("bucket"), col(scoreCol))
  }

  /** The Gopher-style keep decision over [[repetitionStats]] output. */
  def keepDecision(maxDupWordFrac: Double, maxTopWordFrac: Double,
      maxTopBigramFrac: Double): Column =
    col("dup_word_frac") <= maxDupWordFrac &&
      col("top_word_frac") <= maxTopWordFrac &&
      col("top_bigram_frac") <= maxTopBigramFrac
}
