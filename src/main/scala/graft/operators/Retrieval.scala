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
    *
    * The contract is SELF-ENFORCING: a list whose PLAN already proves
    * the bound (a root-level `limit(n)` with n ≤ `maxListRows` — the
    * shape every top-k retrieval stage emits) passes for free; anything
    * else is counted up front, and a list larger than `maxListRows`
    * fails loudly instead of a corpus-sized input silently serializing
    * the whole corpus through the one-partition rank window. The
    * preflight count is one cheap job per unproven list; callers fusing
    * UNBOUNDED lists with expensive unmaterialized lineage should
    * persist them first — the count would otherwise re-execute that
    * lineage once.
    */
  def rrfFuse(lists: Seq[(DataFrame, String)], idCol: String,
      k: Int = 60, topK: Int = 10, maxListRows: Int = 100000): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && topK > 0, s"k and topK must be positive, got k=$k topK=$topK")
    require(maxListRows > 0, s"maxListRows must be positive, got $maxListRows")
    requireCutLists(lists, maxListRows, "rrfFuse",
      "an uncut corpus-sized list would serialize through the single-partition rank window")
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

  /** Per-query reciprocal-rank fusion — [[rrfFuse]] for the BATCHED
    * serving tier: each input list carries a `queryIxCol` alongside
    * (id, score), ranks derive PER QUERY (row_number partitioned by the
    * query index, same (score-rounded-6 desc, id asc) order), and the
    * fused top-k cut is per query. Per-query rows are identical to N
    * independent [[rrfFuse]] calls over the per-query sub-lists
    * (spec-pinned), so the batched composition
    * `searchBm25Batch + bruteForceKnn → rrfFuseBatch` serves exactly
    * what N single-query hybrid stacks would — from ONE pruned postings
    * read and ONE corpus scoring pass.
    *
    * Scale shape: unlike [[rrfFuse]]'s single-partition window, the
    * rank windows here hash-partition by query index — N queries spread
    * across the cluster, each sorting only its own candidate list. The
    * cut-list contract still applies per query (inputs are each leg's
    * per-query top-N); `maxListRows` bounds each list's TOTAL rows
    * (≈ N · per-query cut) with the same loud preflight, sized for
    * batches by default. The static-plan fast path applies here too —
    * batched legs end in per-query rank filters, not a root limit, so
    * append a semantic-no-op `.limit(N · perQueryTopK)` to prove the
    * bound for free (the x2/x3 gate convention); otherwise the bound is
    * counted (bounded by limit(max+1), one cheap job per list that
    * RE-EXECUTES unmaterialized lineage — persist expensive lists
    * first, the [[rrfFuse]] caveat).
    */
  def rrfFuseBatch(lists: Seq[(DataFrame, String)], idCol: String, queryIxCol: String,
      k: Int = 60, topK: Int = 10, maxListRows: Int = 1000000): DataFrame = {
    require(lists.nonEmpty, "rrfFuseBatch needs at least one ranked list")
    require(k > 0 && topK > 0, s"k and topK must be positive, got k=$k topK=$topK")
    require(maxListRows > 0, s"maxListRows must be positive, got $maxListRows")
    requireCutLists(lists, maxListRows, "rrfFuseBatch",
      "each leg must carry only its per-query top-N")
    val contribs = lists.map { case (df, scoreCol) =>
      df.select(col(queryIxCol), col(idCol),
          round(col(scoreCol).cast("double"), 6).as("s"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col(queryIxCol)).orderBy(col("s").desc, col(idCol).asc)))
        .select(col(queryIxCol), col(idCol),
          (lit(1.0) / (lit(k.toDouble) + col("r"))).as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(queryIxCol), col(idCol))
      .agg(round(sum(col("contrib")), 6).as("rrf_score"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(queryIxCol))
          .orderBy(col("rrf_score").desc, col(idCol).asc)))
      .filter(col("__rn") <= topK)
      .select(col(queryIxCol), col(idCol), col("rrf_score"))
  }

  /** ONE copy of the cut-list preflight shared by [[rrfFuse]] and
    * [[rrfFuseBatch]]: static proof first ([[staticallyBounded]] — free),
    * else a count bounded by `limit(max+1)` (saturating —
    * maxListRows = Int.MaxValue must not wrap negative), failing loudly
    * past the ceiling. A fix to the preflight (bound saturation, new
    * provable plan shapes) lands in both entry points by construction.
    */
  private def requireCutLists(lists: Seq[(DataFrame, String)], maxListRows: Int,
      what: String, why: String): Unit =
    lists.zipWithIndex.foreach { case ((df, _), i) =>
      if (!staticallyBounded(df.queryExecution.analyzed, maxListRows)) {
        val cap = if (maxListRows == Int.MaxValue) maxListRows else maxListRows + 1
        val n = df.limit(cap).count()
        require(n <= maxListRows,
          s"$what: input list #$i has more than $maxListRows rows — RRF is defined on CUT " +
            s"candidate lists (each retrieval stage's own top-N); $why. Cut the list " +
            "upstream (limit/top-k), or raise maxListRows if the ceiling is genuinely intended.")
      }
    }

  /** Whether the analyzed plan proves ≤ `max` rows statically: a
    * `GlobalLimit(n ≤ max)` at the root, looking through row-PRESERVING
    * wrappers a caller might stack on a top-k result (projections,
    * aliases, sorts) AND row-NON-INCREASING ones (filters,
    * distinct/deduplicate — a filtered or deduped cut list is still a
    * cut list), so fewer bounded plans pay the preflight count job. A
    * one-row aggregate or literal relation would also qualify, but the
    * limit shape is the one every retrieval stage emits.
    */
  private def staticallyBounded(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, max: Int): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.Literal
    plan match {
      case GlobalLimit(Literal(n: Int, _), _) => n <= max
      case p: Project => staticallyBounded(p.child, max)
      case s: Sort => staticallyBounded(s.child, max)
      case a: SubqueryAlias => staticallyBounded(a.child, max)
      case f: Filter => staticallyBounded(f.child, max)
      case d: Distinct => staticallyBounded(d.child, max)
      case d: Deduplicate => staticallyBounded(d.child, max)
      case l: LocalRelation => l.data.lengthCompare(max) <= 0
      case _ => false
    }
  }
}
