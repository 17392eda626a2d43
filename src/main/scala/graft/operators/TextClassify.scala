package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the corpus-trained
  * quality/domain filter a curation pipeline runs at admission time
  * (the CCNet/fastText-classifier niche, reduced to its reproducible,
  * oracle-replayable core: token-count likelihoods and closed-form
  * training, no SGD and no iteration order to drift between runs).
  * Typical uses: language/domain routing from a labeled seed corpus,
  * "looks like reference text vs looks like spam" scoring where the
  * positive class is a trusted corpus slice.
  *
  * Training is counting: `logp(t|L) = ln((count(t,L) + 1) / (ntok(L) +
  * |V|))` (Laplace smoothing over the training vocabulary `V`) and
  * `logprior(L) = ln(ndocs(L) / ndocs)` — every quantity is an integer
  * count, so the only float arithmetic is the final `ln`, the same
  * ln-parity class the f3/t6 gates pin.
  *
  * Scoring: `score(d, L) = logprior(L) + Σ_t cd(t)·logp(t|L)` over the
  * document's IN-VOCABULARY tokens (OOV tokens carry no signal for any
  * class and are skipped — the standard multinomial-NB treatment that
  * also keeps the replay closed over the training vocab). Prediction is
  * the argmax; exact score ties break to the lexicographically LARGEST
  * label (one struct-max, no window). Documents with no in-vocab tokens
  * (empty, or fully OOV) fall back to the prior argmax.
  *
  * Scale shape: nothing corpus-sized shuffles. Training shuffles
  * per-partition-distinct (token, label) pairs only (map-side combine;
  * vocabulary-sized output by Heaps' law); the dense (token × label)
  * likelihood grid is vocab-sized × |L| and rides an AQE-broadcast join
  * against the scoring side's narrow token explode; the per-document
  * reduction is a (doc, label) partial agg followed by a |L|-bounded
  * struct-max per doc. The two 1-row totals (|V|, ndocs) are explicit
  * broadcasts (the t6 lesson).
  */
object TextClassify {

  /** Train on `train`'s (labelCol, textCol), score every `predict` row;
    * returns (idCol, label, score) with score = the winning class's
    * log-posterior (up to the shared evidence constant), rounded to 4
    * decimals AFTER the argmax.
    */
  def naiveBayes(train: DataFrame, predict: DataFrame, idCol: String,
      labelCol: String, textCol: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokenCounts(coalesce(col(textCol), lit("")))
    val tok = train.select(col(labelCol).as("__lab"), explode(toks).as(Seq("t", "cd")))
    val counts = tok.groupBy("__lab", "t").agg(sum("cd").as("c"))
    val classTotals = counts.groupBy("__lab").agg(sum("c").as("ntok"))
    val vocab = counts.select("t").distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val priors = train.groupBy(col(labelCol).as("__lab")).agg(count(lit(1)).as("nd"))
    val ndocs = priors.agg(sum("nd").as("ndall"))
    // dense (token × label) likelihood: absent counts smooth to ln(1/(ntok+v))
    val grid = vocab.crossJoin(classTotals)
      .join(counts, Seq("t", "__lab"), "left")
      .crossJoin(broadcast(vsize))
      .select(col("t"), col("__lab"),
        log((coalesce(col("c"), lit(0L)).cast("double") + 1.0)
          / (col("ntok").cast("double") + col("v").cast("double"))).as("lp"))
    val prior = priors.crossJoin(broadcast(ndocs))
      .select(col("__lab"),
        log(col("nd").cast("double") / col("ndall").cast("double")).as("lprior"))
    val docTok = predict.select(col(idCol).as("__id"), explode(toks).as(Seq("t", "cd")))
    val perLabel = docTok.join(grid, "t")
      .groupBy("__id", "__lab")
      .agg(sum(col("cd").cast("double") * col("lp")).as("ll"))
      .join(broadcast(prior), "__lab")
      .select(col("__id"), col("__lab"), (col("ll") + col("lprior")).as("__score"))
    val pred = perLabel.groupBy("__id")
      .agg(max(struct(col("__score"), col("__lab"))).as("m"))
      .select(col("__id"), col("m.__lab").as("label"), col("m.__score").as("__score"))
    // prior-argmax fallback for docs with no in-vocab token (1 row, broadcast)
    val priorPick = prior.agg(max(struct(col("lprior"), col("__lab"))).as("pm"))
      .select(col("pm.__lab").as("__plab"), col("pm.lprior").as("__pscore"))
    predict.select(col(idCol))
      .join(pred, col(idCol) === col("__id"), "left")
      .crossJoin(broadcast(priorPick))
      .select(col(idCol),
        coalesce(col("label"), col("__plab")).as("label"),
        round(coalesce(col("__score"), col("__pscore")), 4).as("score"))
  }
}
