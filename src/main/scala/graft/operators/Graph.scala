package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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

  /** Rank vectors at or below this node count ride a broadcast into each
    * round's edge join (the contrib join becomes a map-only
    * BroadcastHashJoin over the cached edge list — the edges are never
    * exchanged, in any round). Above it, the edge cache is instead laid
    * out hash-partitioned + sorted on the source id once at setup, so
    * the per-round sort-merge join exchanges ONLY the node-sized rank
    * frame (guide §2.4/§3.1). 2M rank rows ≈ tens of MB built — inside
    * every sizing guidance for broadcast relations; override with
    * `spark.graft.pagerank.broadcastNodes` where executors are tighter
    * or roomier.
    */
  val BroadcastNodesDefault = 2000000L

  /** The pinned loop invariants of a PageRank run: the degree-joined
    * edge list, the node frame (`__node` [+ `__out` in dangling mode]),
    * the collected node count, and the broadcast decision. All cached;
    * [[release]] drops both frames.
    */
  private case class PrState(e: DataFrame, ids: DataFrame, n: Double,
      dangling: Boolean, bcastRanks: Boolean) {
    def release(): Unit = { e.unpersist(); ids.unpersist(); () }
  }

  /** Build and pin the loop invariants (shared by the fixed-iteration
    * and convergence forms so the arithmetic can never diverge between
    * them). Weight validation lives here — see [[pageRank]]'s Scaladoc.
    *
    * Runs ONE job at call time: the node count. Knowing n as a literal
    * (instead of a 1-row crossJoin-broadcast total in every round's
    * plan) removes a broadcast exchange per round and is what the
    * broadcast-vs-copartition decision keys on.
    */
  private def prSetup(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, nodeCol: String, weightCol: Option[String],
      redistributeDangling: Boolean, roundsUseSmj: Boolean): PrState = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val rawIds = nodes.select(col(nodeCol).as("__node"))
    val n = rawIds.count().toDouble
    val bcastRanks = n <= edges.sparkSession.conf
      .getOption("spark.graft.pagerank.broadcastNodes")
      .map(_.toLong).getOrElse(BroadcastNodesDefault).toDouble
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
    val eJoined = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"), w.as("__w"))
      .join(outd, "__src")
      .select(col("__src"), col("__dst"), col("__w"), degChecked.as("__deg"))
    // Above the broadcast threshold every round's join is a real
    // sort-merge join, so the loop-invariant caches are laid out
    // partitioned + SORTED on their join keys ONCE and each round
    // exchanges only the round-varying rank frame — the loop-invariant
    // side must not pay a shuffle (or re-sort) per round (§2.4). At or
    // below the threshold the rank side rides a broadcast (explicitly in
    // the convergence form; via AQE's runtime join conversion in the
    // lazy forms — measured: the tiny-rank SMJs all convert locally, so
    // pre-partitioning small graphs only added two setup shuffles), and
    // the edge cache keeps the cheaper scan layout.
    val e = (if (bcastRanks) eJoined
             else eJoined.repartition(col("__src")).sortWithinPartitions("__src"))
      .persist(lvl)
    // dangling mode pins has-out-edges as a static per-node flag (the
    // dangling SET never changes between rounds — only the mass does),
    // replacing what used to be a per-round anti-join against a distinct
    // source-id frame with a flag already sitting on the rank rows.
    val ids0 = rawIds
    val idsFlagged =
      if (redistributeDangling)
        ids0.join(e.select(col("__src").as("__node")).distinct()
            .withColumn("__has_out", lit(true)), Seq("__node"), "left")
          .select(col("__node"), coalesce(col("__has_out"), lit(false)).as("__out"))
      else ids0
    val idsLaid =
      if (!bcastRanks && roundsUseSmj)
        idsFlagged.repartition(col("__node")).sortWithinPartitions("__node")
      else idsFlagged
    // the node frame is the per-round join input only in the
    // fixed-iteration forms; the convergence loop reads it ONCE (prInit,
    // the rounds use the previous checkpoint as their node frame), and a
    // corpus-scale cache pinned for zero reuse is storage waste (review
    // finding). release() on an unpersisted frame is a no-op.
    val ids = if (roundsUseSmj) idsLaid.persist(lvl) else idsLaid
    PrState(e, ids, n, redistributeDangling, bcastRanks)
  }

  /** One propagation round: `pr_{t+1}(v) = (1−d)/n + d·(Σ pr_t(u)·w/W(u)
    * [+ S_t/n])` — the single source of the PageRank arithmetic, driven
    * by both public forms.
    *
    * `carryPrev = true` (the convergence loop) uses `pr` itself as the
    * node frame — every rank row carries its previous value out as
    * `__pr0`, so the caller can fold the delta check into the SAME job
    * via `observe()` instead of running a second join+agg job per round.
    * Only sound when `pr` is materialized (a checkpoint): the lazy
    * fixed-iteration form keeps the cached `ids` node frame so each
    * round references `pr` once and the unrolled lineage stays linear.
    *
    * `prMaterialized` gates the broadcast hint: hinting a LAZY rank
    * frame (the unrolled prior-round plan) measured SLOWER than letting
    * AQE re-plan the unrolled tree (v8 3.99→4.76 s, v8b 6.49→9.36 s on
    * the same session) — each round's BroadcastExchange serializes the
    * whole prior lineage through a driver collect instead of letting
    * the stage DAG pipeline. A checkpointed rank frame has no such
    * lineage, and there the hint removes both join exchanges per round.
    */
  private def prRound(st: PrState, pr: DataFrame, damping: Double,
      carryPrev: Boolean = false, prMaterialized: Boolean = false): DataFrame = {
    val prj = pr.select(col("__node"), col("__pr"))
    val contrib = st.e.join(if (st.bcastRanks && prMaterialized) broadcast(prj) else prj,
        col("__src") === col("__node"))
      .groupBy(col("__dst").as("__to"))
      .agg(sum(col("__pr") * col("__w") / col("__deg")).as("__m"))
    val inMass =
      if (!st.dangling) coalesce(col("__m"), lit(0.0))
      else coalesce(col("__m"), lit(0.0)) + col("__dm") / lit(st.n)
    val nodeF =
      if (carryPrev)
        pr.select(col("__node") +: col("__pr").as("__pr0") +:
          (if (st.dangling) Seq(col("__out")) else Nil): _*)
      else st.ids
    val joined = nodeF.join(contrib, col("__node") === col("__to"), "left")
    val withDangling =
      if (!st.dangling) joined
      else {
        // S_t: summed rank of the (static) dangling node set this round —
        // a 1-row broadcast, like the node count. The flag lives on the
        // rank rows, so this is one agg over pr, no join.
        val dangMass = pr.filter(!col("__out"))
          .agg(coalesce(sum(col("__pr")), lit(0.0)).as("__dm"))
        joined.crossJoin(broadcast(dangMass))
      }
    val outCols = col("__node") +:
      (lit((1.0 - damping) / st.n) + lit(damping) * inMass).as("__pr") +:
      ((if (st.dangling) Seq(col("__out")) else Nil) ++
        (if (carryPrev) Seq(col("__pr0")) else Nil))
    withDangling.select(outCols: _*)
  }

  /** The uniform 1/n starting vector (plus the static dangling flag when
    * that mode is on — it rides the rank rows through every round).
    */
  private def prInit(st: PrState): DataFrame =
    st.ids.select(col("__node") +: lit(1.0 / st.n).as("__pr") +:
      (if (st.dangling) Seq(col("__out")) else Nil): _*)

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
    * both modes replay identically in the oracle. The dangling SET is
    * static, so it is pinned once at setup as a per-node flag riding the
    * rank rows; each round's S_t is one aggregate over the rank frame
    * (a 1-row broadcast), not a per-round anti-join. SINGLE-ACTION
    * contract in this mode: each round's rank frame is read twice (the
    * contrib join + the dangling sum) behind a per-round cache that
    * auto-releases after the first action on the result — a SECOND
    * action re-executes the unrolled lineage uncached, doubling per
    * round (2^iters). Run one action, or persist the returned frame
    * before fanning out — or pass `truncateLineage = true`.
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
    * Scale shape per iteration (r19 optimization round): rank vectors at
    * or below `spark.graft.pagerank.broadcastNodes` (default
    * [[BroadcastNodesDefault]]) are BROADCAST into the contrib join, so
    * the cached edge list is never exchanged — the only per-round
    * shuffle is the map-side-combined destination sum. Above the
    * threshold the edge cache is laid out hash-partitioned + sorted on
    * the source id once at setup and each round's sort-merge join
    * exchanges only the node-sized rank frame — either way the
    * loop-invariant edge bytes cross the network at most once, not once
    * per round. Everything stays edge-list-sized (k·n for a kNN graph),
    * never quadratic; setup runs one node-count job so n is a literal
    * in the round expressions (no per-round 1-row broadcast total).
    * NOTE (r19): that count means EVERY form — including this default
    * lazy one — runs one job over `nodes` at CALL time; the returned
    * frame itself stays lazy and replayable, but plan-only callers
    * (Explain) pay the count, and `nodes` must not mutate between the
    * call and the first action (the literal n is read once). Fixed
    * small `iters` keeps the unrolled plan shallow.
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
    val st = prSetup(edges, srcCol, dstCol, nodes, nodeCol, weightCol, redistributeDangling,
      roundsUseSmj = true) // both fixed-iteration modes join, never broadcast
    val roundCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var pr = prInit(st)
    // truncate mode runs jobs INSIDE this loop — release the invariants
    // if a round fails, else a cancelled call strands corpus-sized
    // caches for the session (the r14 incremental-twin convention)
    try (1 to iters).foreach { round =>
      // NO broadcast hint in either fixed-iteration mode: truncate mode
      // promises ranks bit-identical to the replayable default
      // (GraphSpec pins it), and a different join strategy reorders the
      // contrib partial sums at the last ULP. Only the convergence form
      // (no replay contract) takes the broadcast fast path.
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
    * over the previous round's checkpointed blocks, and plan depth
    * stays constant regardless of how many rounds convergence takes.
    * The per-round delta rides the SAME job as the round itself: the
    * round carries each node's previous rank out as `__pr0` (the node
    * frame IS the previous checkpoint — no extra join) and
    * `max|__pr − __pr0|` is collected via `observe()` on the checkpoint
    * job (the connectedComponents convention) — one job per round where
    * it used to be two (round + a separate delta join/agg job).
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
    val st = prSetup(edges, srcCol, dstCol, nodes, nodeCol, weightCol, redistributeDangling,
      roundsUseSmj = false) // rounds broadcast the rank frame when it fits
    var pr = prInit(st).localCheckpoint()
    // `next` lives outside the loop so the catch can release it: the
    // observation read (or a release) can throw AFTER the eager
    // checkpoint materialized, and nothing else would ever unpersist
    // those blocks
    var next: DataFrame = null
    try {
      var rounds = 0
      var delta = Double.PositiveInfinity
      val keep = col("__node") +: col("__pr") +:
        (if (redistributeDangling) Seq(col("__out")) else Nil)
      while (rounds < maxIters && delta >= tol) {
        // the delta observation completes with the checkpoint job itself
        // (coalesce covers the empty-node-set edge, where max()
        // aggregates nothing)
        val obs = Observation(s"pr-delta-$rounds-${System.nanoTime()}")
        next = prRound(st, pr, damping, carryPrev = true, prMaterialized = true)
          .observe(obs, coalesce(max(abs(col("__pr") - col("__pr0"))), lit(0.0)).as("delta"))
          .select(keep: _*)
          .localCheckpoint()
        delta = obs.get("delta").asInstanceOf[Double]
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
