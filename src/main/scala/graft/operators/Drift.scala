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
    // per-side totals: two bounded scalars pulled to the driver (the
    // vocabs are checkpointed, so this extra vocab-sized action is cheap)
    // and folded back as literals — one fewer join than a crossJoin(totals)
    // plan, and it lets an empty side fail LOUDLY instead of silently
    // nulling js_nats (p = ca/0 is null in Spark but inf/NaN in DuckDB —
    // divergent oracle semantics on the edge)
    val totalsRow = joined.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb")).collect()(0)
    val na = if (totalsRow.isNullAt(0)) 0L else totalsRow.getLong(0)
    val nb = if (totalsRow.isNullAt(1)) 0L else totalsRow.getLong(1)
    require(na > 0 && nb > 0,
      s"tokenJsDivergence: both slices need at least one token (a=$na, b=$nb) — " +
        "JS divergence over an empty distribution is undefined")
    joined
      .select((col("ca") / na.toDouble).as("p"), (col("cb") / nb.toDouble).as("q"))
      .select(col("p"), col("q"), ((col("p") + col("q")) / 2.0).as("m"))
      .agg(
        round(
          (sum(when(col("p") > 0, col("p") * log(col("p") / col("m"))).otherwise(0.0)) +
            sum(when(col("q") > 0, col("q") * log(col("q") / col("m"))).otherwise(0.0))) / 2.0,
          scale).as("js_nats"))
      .select(lit(na).as("n_tokens_a"), lit(nb).as("n_tokens_b"), col("js_nats"))
  }
}
