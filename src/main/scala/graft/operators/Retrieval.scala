package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * ([[InvertedIndex.searchBm25]]) with a semantic one
  * ([[Similarity.bruteForceKnn]] / IVF / PQ) is the standard shape of a
  * production search stack, and the corpus-curation analog (pick the
  * best evidence documents per query across signals) is the retrieval
  * half of the hybrid dedup x1 already gates. The reference has no
  * ranking surface at all (its `DKV` search stops at key lookup); this
  * is part of the §2.7-class completion beyond it.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher's RRF): each input
    * list contributes 1/(k + rank) per document; documents missing from
    * a list contribute nothing from it. `k` (default 60, the published
    * constant) damps the head so one list's #1 cannot dominate.
    *
    * Determinism contract (the oracle-replay pattern): ranks are derived
    * HERE from each list's score column — descending on the score
    * rounded to 6 decimals, ties broken by ascending id — so two engines
    * computing the same scores derive the same ranks; the fused score is
    * itself rounded to 6 before the top-k cut (id-ascending tiebreak).
    * Pass scores already rounded the same way for cross-engine parity.
    *
    * Scale shape: inputs are CANDIDATE LISTS — each already cut to its
    * own top-N by the retrieval stage that produced it — so the
    * single-partition rank window here orders N-sized lists, not the
    * corpus; the corpus-sized work (postings pruning, ANN bucketing)
    * happened upstream. Fusing unbounded lists is a misuse: the rank of
    * a document nobody would return cannot change the head of the fused
    * list (1/(k+rank) decays), which is why RRF is defined on cut lists.
    */
  def rrfFuse(lists: Seq[(DataFrame, String)], idCol: String,
      k: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && topK > 0, s"k and topK must be positive, got k=$k topK=$topK")
    val contribs = lists.map { case (df, scoreCol) =>
      df.select(col(idCol), round(col(scoreCol).cast("double"), 6).as("s"))
        .withColumn("r", row_number().over(Window.orderBy(col("s").desc, col(idCol).asc)))
        .select(col(idCol), (lit(1.0) / (lit(k.toDouble) + col("r"))).as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }
}
