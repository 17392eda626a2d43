package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

/** Iterative graph analytics over edge-list DataFrames — the curation
  * substrate on top of [[Similarity.annKnnGraph]]: PageRank centrality
  * over a corpus's nearest-neighbor graph surfaces the REPRESENTATIVE
  * documents of each semantic region (high in-degree from their
  * neighborhood), the complement of what near-dup removal prunes.
  * (Transitive closure / connected components live in
  * [[Dedup.connectedComponents]]; this adds weighted-propagation
  * iteration.)
  */
object Graph {

  /** The pinned loop invariants of a PageRank run: the degree-joined
    * edge list, the (node, count) frame, and — dangling mode only — the
    * distinct source-id set. All cached; [[release]] drops all three.
    */
  private case class PrState(e: DataFrame, ids: DataFrame, srcs: Option[DataFrame]) {
    def release(): Unit = { e.unpersist(); ids.unpersist(); srcs.foreach(_.unpersist()); () }
  }

  /** Build and pin the loop invariants (shared by the fixed-iteration
    * and convergence forms so the arithmetic can never diverge between
    * them). Weight validation lives here — see [[pageRank]]'s Scaladoc.
    */
  private def prSetup(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, weightCol: Option[String],
      redistributeDangling: Boolean): PrState = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val rawIds = nodes.select(col(nodeCol).as("__node"))
    val nTotal = rawIds.agg(count(lit(1)).cast("double").as("__cnt"))
    // null and NEGATIVE weights fail loudly AT EXECUTION (see Scaladoc)
    // — the when-condition is null for a null weight, so both cases fall
    // to the raise_error branch; zero passes (no mass, no poison).
    // Codegen'd, no preflight job.
    val w = weightCol.map { c =>
      when(col(c).cast("double") >= 0, col(c).cast("double"))
        .otherwise(raise_error(concat(
          lit(s"pageRank: null or negative weight in '$c' for source "),
          col(srcCol).cast("string"))))
    }.getOrElse(lit(1.0))
    val outd = edges.groupBy(col(srcCol).as("__src")).agg(sum(w).as("__deg"))
    // a source with edges but TOTAL out-weight <= 0 would make every one
    // of its w/W(u) terms 0/0 = NaN and poison the destination sums —
    // the one remaining silent-NaN path, closed here at the same
    // raise_error tier (the guard sits on the joined edge rows, so a
    // weightless default — __deg = out-degree >= 1 — never trips it)
    val degChecked =
      when(col("__deg") > 0, col("__deg")).otherwise(raise_error(concat(
        lit("pageRank: source "), col("__src").cast("string"),
        lit(" has edges but non-positive total out-weight — filter or threshold upstream"))))
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"), w.as("__w"))
      .join(outd, "__src")
      .select(col("__src"), col("__dst"), col("__w"), degChecked.as("__deg"))
      .persist(lvl)
    val ids = rawIds.crossJoin(broadcast(nTotal)).persist(lvl)
    val srcs =
      if (redistributeDangling) Some(e.select(col("__src").as("__node")).distinct().persist(lvl))
      else None
    PrState(e, ids, srcs)
  }

  /** One propagation round: `pr_{t+1}(v) = (1−d)/n + d·(Σ pr_t(u)·w/W(u)
    * [+ S_t/n])` — the single source of the PageRank arithmetic, driven
    * by both public forms.
    */
  private def prRound(st: PrState, pr: DataFrame, damping: Double): DataFrame = {
    val contrib = st.e.join(pr, col("__src") === col("__node"))
      .groupBy(col("__dst").as("__to"))
      .agg(sum(col("__pr") * col("__w") / col("__deg")).as("__m"))
    val inMass = st.srcs match {
      case None => coalesce(col("__m"), lit(0.0))
      case Some(_) => coalesce(col("__m"), lit(0.0)) + col("__dm") / col("__cnt")
    }
    val joined = st.ids.join(contrib, col("__node") === col("__to"), "left")
    val withDangling = st.srcs match {
      case None => joined
      case Some(s) =>
        // S_t: summed rank of nodes with no out-edges this round —
        // a 1-row broadcast, like the node count
        val dangMass = pr.join(s, Seq("__node"), "left_anti")
          .agg(coalesce(sum(col("__pr")), lit(0.0)).as("__dm"))
        joined.crossJoin(broadcast(dangMass))
    }
    withDangling.select(col("__node"),
      (lit(1.0 - damping) / col("__cnt") + lit(damping) * inMass).as("__pr"))
  }

  /** The uniform 1/n starting vector. */
  private def prInit(st: PrState): DataFrame =
    st.ids.select(col("__node"), (lit(1.0) / col("__cnt")).as("__pr"))

  /** PageRank with a FIXED iteration count — deterministic by
    * construction (no convergence test, no float epsilon in control
    * flow), so any engine replaying the same `iters` chained joins gets
    * the same ranks. `pr_{t+1}(v) = (1−d)/n + d·Σ_{u→v} pr_t(u)·w(u,v)/W(u)`
    * over `edges`, where the unweighted default is w ≡ 1 and W(u) = the
    * out-degree (multiplying by the 1.0 literal is IEEE-exact, so the
    * unweighted arithmetic is bit-identical to the classic form).
    *
    * `weightCol` opts into similarity-weighted propagation — the
    * curation-relevant variant over [[Similarity.annKnnGraph]]'s output,
    * whose `sim` column carries each edge's cosine: mass flows
    * proportionally to neighbor similarity instead of uniformly. Weight
    * validation fails LOUDLY at execution time (`raise_error` inside the
    * expressions — the weightedReservoirPerGroup convention, codegen'd,
    * no preflight job) on the two silently-mis-ranking classes: a NULL
    * or NEGATIVE weight (sum() skips nulls in W(u); negative mass is
    * not a random walk), and a source whose TOTAL out-weight is ≤ 0
    * (its w/W(u) is 0/0 = NaN, which poisons every destination sum).
    * ZERO-weight edges are allowed — they contribute no mass, which is
    * exactly what annKnnGraph's round(cos, 6) = 0.0 near-orthogonal
    * edges should do — so the documented annKnnGraph ∘ pageRank
    * composition never trips the guard on benign ties; kNN graphs with
    * genuinely NEGATIVE cosines must be thresholded upstream (a
    * negative-weight walk has no PageRank semantics).
    *
    * `redistributeDangling = true` opts into conserving dangling mass:
    * each round, the summed rank of nodes with NO out-edges spreads
    * uniformly (`+ d·S_t/n` to every node) — the textbook stochastic
    * completion. Default false drops it (the standard simplification);
    * both modes replay identically in the oracle. SINGLE-ACTION contract
    * in this mode: each round's rank frame is read twice (contrib join +
    * dangling sum) behind a per-round cache that auto-releases after the
    * first action on the result — a SECOND action re-executes the
    * unrolled lineage uncached, doubling per round (2^iters). Run one
    * action, or persist the returned frame before fanning out — or pass
    * `truncateLineage = true`.
    *
    * `truncateLineage = true` removes the single-action footgun (and the
    * deep unrolled plan) entirely: each round eagerly
    * `localCheckpoint`s, so every round is ONE job over the previous
    * round's materialized blocks and the returned frame is a bare read
    * of the final checkpoint — N actions cost N reads, never a replay.
    * Tradeoffs (why it is opt-in, the d6 pattern): rounds execute at
    * CALL time (not lazily at the first action), checkpointed blocks are
    * not rebuilt on executor loss, and the final checkpoint stays cached
    * until `graftbridge.releaseCheckpoints(result)` (or executor exit);
    * intermediate rounds' checkpoints release as soon as the next round
    * materializes. The default stays fully replayable for the oracle.
    * Iterating until a tolerance instead of a fixed count →
    * [[pageRankConverged]].
    *
    * Scale shape per iteration: one shuffle join of the edge list with
    * the rank frame on the source id, one map-side-combined sum per
    * destination, one left join back to the node set — everything
    * edge-list-sized (k·n for a kNN graph), never quadratic. The node
    * count rides a broadcast 1-row total (the t6 lesson); the dangling
    * mass (when enabled) is a broadcast 1-row sum over a pinned
    * source-id anti-join — also edge-bounded. Fixed small `iters` keeps
    * the unrolled plan shallow.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, iters: Int = 3,
      damping: Double = 0.85, weightCol: Option[String] = None,
      redistributeDangling: Boolean = false,
      truncateLineage: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20] (fixed-iteration contract), got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1), got $damping")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val st = prSetup(edges, srcCol, dstCol, nodes, nodeCol, weightCol, redistributeDangling)
    val roundCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var pr = prInit(st)
    // truncate mode runs jobs INSIDE this loop — release the invariants
    // if a round fails, else a cancelled call strands corpus-sized
    // caches for the session (the r14 incremental-twin convention)
    try (1 to iters).foreach { round =>
      pr = prRound(st, pr, damping)
      if (truncateLineage) {
        // eager checkpoint: this round runs NOW as one job over the
        // previous round's blocks; the previous round's checkpoint is
        // then releasable immediately (this one holds its own data)
        val checkpointed = pr.localCheckpoint()
        roundCaches.lastOption.foreach(graftbridge.releaseCheckpoints(_))
        roundCaches.clear()
        roundCaches += checkpointed
        pr = checkpointed
      } else if (redistributeDangling && round < iters) {
        // dangling mode reads each round's pr TWICE (the next round's
        // contrib join and its dangling sum): uncached, every round would
        // re-execute the whole unrolled lineage beneath both references —
        // 2^iters blowup. One node-set-sized cache per round bounds it
        // (≤ 20 by the iters contract); all release after the first
        // action, like e/ids. The LAST round's frame is read once (by the
        // result alone), so it skips the cache.
        pr = pr.persist(lvl)
        roundCaches += pr
      }
    } catch {
      case t: Throwable if truncateLineage =>
        st.release()
        roundCaches.foreach(graftbridge.releaseCheckpoints(_))
        throw t
    }
    val result = pr.select(col("__node").as(nodeCol), col("__pr").as("pagerank"))
    if (truncateLineage) {
      // the rounds already executed; the invariants are done serving
      st.release()
      // the final checkpoint stays (it IS the result's data) — caller
      // releases via graftbridge.releaseCheckpoints(result) or at exit
    } else {
      CacheRelease.autoRelease(result, st.e, () => { st.e.unpersist(); () })
      CacheRelease.autoRelease(result, st.ids, () => { st.ids.unpersist(); () })
      st.srcs.foreach(s => CacheRelease.autoRelease(result, s, () => { s.unpersist(); () }))
      roundCaches.foreach(c => CacheRelease.autoRelease(result, c, () => { c.unpersist(); () }))
    }
    result
  }

  /** PageRank iterated to CONVERGENCE: rounds run until
    * `max_v |pr_{t+1}(v) − pr_t(v)| < tol` or `maxIters`, whichever
    * comes first — what a production centrality job actually runs (a
    * fixed count either wastes rounds or stops short as the graph's
    * mixing time drifts with the corpus). Built on the
    * [[pageRank]] `truncateLineage` machinery: every round is one job
    * over the previous round's checkpointed blocks, the per-round delta
    * check is one O(n) co-partitioned join + 1-row agg, and plan depth
    * stays constant regardless of how many rounds convergence takes.
    * Same propagation arithmetic as [[pageRank]] by construction (one
    * shared round function), so `weightCol`/`redistributeDangling`
    * behave identically.
    *
    * NOT oracle-replayable by design — the stopping rule is a float
    * comparison, exactly the control-flow epsilon the fixed-iteration
    * gate form exists to avoid; use [[pageRank]] where replay matters.
    * Returns (ranks, roundsRun); roundsRun == maxIters with a delta
    * still above tol means the walk had not mixed — raise maxIters or
    * loosen tol. Eager like truncate mode: rounds execute at call time,
    * the returned frame is a bare checkpoint read, and the final
    * checkpoint stays cached until `graftbridge.releaseCheckpoints` (or
    * executor exit).
    */
  def pageRankConverged(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String,
      tol: Double = 1e-8, maxIters: Int = 100,
      damping: Double = 0.85, weightCol: Option[String] = None,
      redistributeDangling: Boolean = false): (DataFrame, Int) = {
    require(tol > 0, s"tol must be positive, got $tol")
    require(maxIters >= 1 && maxIters <= 10000, s"maxIters must be in [1, 10000], got $maxIters")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1), got $damping")
    val st = prSetup(edges, srcCol, dstCol, nodes, nodeCol, weightCol, redistributeDangling)
    var pr = prInit(st).localCheckpoint()
    // `next` lives outside the loop so the catch can release it: the
    // delta job (or a release) can throw AFTER the eager checkpoint
    // materialized, and nothing else would ever unpersist those blocks
    var next: DataFrame = null
    try {
      var rounds = 0
      var delta = Double.PositiveInfinity
      while (rounds < maxIters && delta >= tol) {
        next = prRound(st, pr, damping).localCheckpoint()
        // both sides are materialized checkpoints: the delta is one
        // co-partitioned join + 1-row agg (coalesce covers the
        // empty-node-set edge, where max() aggregates nothing)
        delta = next.join(pr.select(col("__node"), col("__pr").as("__pr0")), "__node")
          .agg(coalesce(max(abs(col("__pr") - col("__pr0"))), lit(0.0)))
          .head().getDouble(0)
        graftbridge.releaseCheckpoints(pr)
        pr = next
        next = null
        rounds += 1
      }
      st.release()
      (pr.select(col("__node").as(nodeCol), col("__pr").as("pagerank")), rounds)
    } catch {
      case t: Throwable =>
        st.release()
        if (next != null) graftbridge.releaseCheckpoints(next)
        graftbridge.releaseCheckpoints(pr)
        throw t
    }
  }
}
