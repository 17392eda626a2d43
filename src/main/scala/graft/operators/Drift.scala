package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenCounts

/** Distribution-drift detection between corpus slices — the monitoring
  * step a continuously-ingested training corpus needs: is today's batch
  * distributed like the corpus it joins? Did the eval split drift from
  * train? Jensen-Shannon divergence between unigram token distributions
  * (symmetric, always finite — zero-count tokens contribute 0 to their
  * own side, unlike KL), in nats.
  *
  * Scale shape: each side is the f3 vocabulary pass — the narrow
  * [[tokenCounts]] map expression per doc, map-explode, one (token) agg
  * with map-side combine whose output is VOCABULARY-sized, never
  * corpus-sized. The two vocab aggs full-outer join on token
  * (vocab-sized again) and the JS terms reduce in one scalar agg.
  * Nothing corpus-sized ever shuffles.
  */
object Drift {

  /** Vocabulary-level token counts for one slice: (token, cnt). */
  private def vocab(slice: DataFrame, textCol: String): DataFrame =
    slice.select(explode(tokenCounts(col(textCol))).as(Seq("token", "cd")))
      .groupBy("token").agg(sum(col("cd")).as("cnt"))

  /** One row: total token counts of both sides and their JS divergence
    * (rounded to `scale` decimals for cross-engine ln parity, the f3
    * precedent).
    */
  def tokenJsDivergence(a: DataFrame, b: DataFrame, textCol: String,
      scale: Int = 4): DataFrame = {
    // eager localCheckpoint: the joined frame feeds BOTH the totals agg
    // and the term computation — without it one action would tokenize
    // and vocab-aggregate each corpus twice
    val va = vocab(a, textCol).localCheckpoint()
    val vb = vocab(b, textCol).localCheckpoint()
    val joined = va.withColumnRenamed("cnt", "ca")
      .join(vb.withColumnRenamed("cnt", "cb"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    // per-side totals (two scalars) cross-joined back — a one-row
    // broadcast, so the term computation stays a single vocab-sized pass
    val totals = joined.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    joined.crossJoin(totals)
      .select(col("na"), col("nb"),
        (col("ca") / col("na")).as("p"),
        (col("cb") / col("nb")).as("q"))
      .select(col("na"), col("nb"), col("p"), col("q"),
        ((col("p") + col("q")) / 2.0).as("m"))
      .agg(first(col("na")).as("n_tokens_a"), first(col("nb")).as("n_tokens_b"),
        round(
          (sum(when(col("p") > 0, col("p") * log(col("p") / col("m"))).otherwise(0.0)) +
            sum(when(col("q") > 0, col("q") * log(col("q") / col("m"))).otherwise(0.0))) / 2.0,
          scale).as("js_nats"))
  }
}
