package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.hashBucket

/** Deterministic (consistent) sampling for training-data curation.
  *
  * Unlike `df.sample()` (seeded per-partition RNG: the kept set changes
  * with partitioning, and a re-run over re-split files samples different
  * rows), these operators hash the ROW IDENTITY — the same document is
  * in or out of the sample regardless of cluster size, file layout, or
  * retry history. That property is what makes a 100 TB sample auditable:
  * the keep decision is a pure function of (id, seed, rate), and any
  * engine (the DuckDB oracle included) can replay it.
  *
  * Scale shape: a narrow filter in the scan stage (codegen'd splitmix64,
  * no shuffle, no state). Rates are expressed in millionths (bucket
  * space 10^6) so rate resolution is 0.0001 %.
  */
object Sampling {

  val Buckets = 1000000L

  private def keep(id: Column, rate: Double, seed: Long): Column =
    hashBucket(id, Buckets, seed) < lit((rate * Buckets).round)

  /** Keep ~`rate` of rows, decided by splitmix64(id, seed). */
  def hashSample(df: DataFrame, idCol: String, rate: Double, seed: Long = 42L): DataFrame =
    df.filter(keep(col(idCol), rate, seed))

  /** Stratified variant: per-stratum rates (e.g. per-language up/down
    * sampling to rebalance a corpus), same deterministic hash. Strata
    * missing from `rates` fall back to `defaultRate`.
    */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Seq[(String, Double)], defaultRate: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    val bucket = hashBucket(col(idCol), Buckets, seed)
    val thr = rates.foldLeft(lit((defaultRate * Buckets).round)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit((rate * Buckets).round)).otherwise(acc)
    }
    df.filter(bucket < thr)
  }

  /** Mixture (data-mixing) sampling: per-stratum rates COMPUTED FROM THE
    * DATA rather than given — each stratum (source, domain, language) is
    * downsampled toward a per-stratum weight budget (e.g. a token budget
    * per source in a training mix): rate = budget / stratum_total,
    * capped at 1. The keep decision is then the same deterministic
    * splitmix64 hash as [[hashSample]], so the mix is auditable and
    * replayable even though the rates are data-dependent.
    *
    * The threshold is computed as `floor(budget·Buckets / total)` in
    * DOUBLE division — written exactly that way in the oracle too, so
    * the IEEE operation sequence (and hence the boundary buckets) match
    * bit-for-bit.
    *
    * Scale shape: one map-side-combined aggregation producing one row
    * per stratum (broadcast back), then the codegen'd hash filter in
    * the scan stage — no data-sized shuffle.
    */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, budgetPerStratum: Long, seed: Long = 42L): DataFrame = {
    val totals = df.groupBy(stratumCol)
      .agg(sum(col(weightCol).cast("long")).as("__stratum_total"))
      .withColumnRenamed(stratumCol, "__stratum")
    // budget·Buckets in DOUBLE: the Long product wraps negative past
    // ~9.2e12 budget (realistic token budgets at 100 TB) and would
    // silently drop every stratum; double is exact to 2^53, beyond which
    // the rounding is a sub-ulp rate perturbation, not a sign flip
    val thr = least(
      lit(Buckets),
      floor(lit(budgetPerStratum.toDouble * Buckets) / col("__stratum_total").cast("double"))
        .cast("long"))
    // null-safe stratum match: an equi-join would silently drop every
    // null-stratum row (unattributed data) from the mix — null is a
    // stratum like any other, exactly as the groupBy above treats it
    df.join(broadcast(totals), col(stratumCol) <=> col("__stratum"))
      .filter(hashBucket(col(idCol), Buckets, seed) < thr)
      .drop("__stratum", "__stratum_total")
  }

  /** Temperature-weighted mixture sampling — the multilingual-training
    * rebalancing rule: stratum g with corpus share p_g is sampled toward
    * target share q_g ∝ p_g^alpha (alpha < 1 flattens the head and
    * upweights tail languages; alpha = 1 preserves the natural mix), so
    * with target size B the per-stratum rate is min(1, B·q_g / n_g).
    * The keep decision is the same deterministic splitmix64 hash as
    * [[hashSample]] — the mix is auditable and replayable even though
    * every rate is data-dependent.
    *
    * Determinism across engines (the mix1 bit-for-bit pattern, hardened
    * for the cross-STRATUM sum this rule needs): weights quantize to
    * integers (round(n^alpha · 1000)), so the weight total is an exact
    * integer sum — order-free, unlike a float sum over shuffled groups —
    * and the threshold is one double expression of exactly-representable
    * integers (floor(B·Buckets · w / (wsum · n))): multiply/divide are
    * IEEE-correctly-rounded, so any engine replaying the same expression
    * gets the same buckets. alpha = 0.5 evaluates via sqrt (correctly
    * rounded, unlike pow) — the replay-exact operating point; other
    * alphas ride pow parity, the t6/f3 ln-parity class.
    *
    * Oversubscribed strata (B·q_g > n_g) cap at keep-everything; the
    * shortfall is NOT redistributed (redistribution iterates to a
    * fixpoint and breaks single-expression replay) — callers wanting
    * exact totals re-run with a higher B.
    *
    * Scale shape: one map-side-combined count per stratum (+ a 1-row
    * weight total, both broadcast back), then the codegen'd hash filter
    * in the scan stage — no data-sized shuffle.
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, targetSize: Long, seed: Long = 42L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetSize > 0, s"targetSize must be positive, got $targetSize")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
      .withColumnRenamed(stratumCol, "__stratum")
    val nDouble = col("__n").cast("double")
    val rawW = if (alpha == 0.5) sqrt(nDouble) else pow(nDouble, lit(alpha))
    val weighted = counts.withColumn("__w", round(rawW * 1000, 0).cast("long"))
    val wsum = weighted.agg(sum(col("__w")).as("__wsum"))
    val thr = least(
      lit(Buckets),
      floor(lit(targetSize.toDouble * Buckets) * col("__w").cast("double")
        / (col("__wsum").cast("double") * nDouble)).cast("long"))
    // explicit hint for the 1-row total (the t6 lesson: an unhinted
    // 1-row cross join can plan as CartesianProductExec)
    val rates = weighted.crossJoin(broadcast(wsum))
      .select(col("__stratum"), thr.as("__thr"))
    // null-safe stratum match, as in [[mixtureSample]]: null is a
    // stratum like any other
    df.join(broadcast(rates), col(stratumCol) <=> col("__stratum"))
      .filter(hashBucket(col(idCol), Buckets, seed) < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Fractional EPOCH repetition — the data-mixture upsampling knob: a
    * stratum with factor 2.3 emits 2 full copies of every row plus a
    * deterministic 30 % hash-sampled third copy; factor 0.4 degenerates
    * to a 40 % downsample. Each emitted copy carries an epoch index
    * (0-based; the fractional copy is the last index), so downstream
    * packing/sharding can interleave epochs and the output stays
    * hash-comparable. The fractional-copy keep set is the same
    * splitmix64(id, seed) bucket decision as [[hashSample]] — replayable
    * by any engine, stable under partitioning and corpus growth.
    *
    * Factors are quantized to millionths (the [[Buckets]] resolution):
    * full copies = floor(f·10^6)/10^6, fractional threshold = the
    * remainder — one integer per stratum, so the replay has no float
    * boundary. Strata absent from `factors` get `defaultFactor`; factor
    * 0 drops the stratum.
    *
    * Scale shape: a codegen when-chain (copies per row) + an explode in
    * the scan stage — no shuffle, no state; output size is Σ f_g·n_g by
    * construction. At 100 TB the multiplier runs where the data sits,
    * and the epoch tag (not physical row order) carries the repetition
    * structure to the shuffle-free shard writer ([[Sharding]]).
    */
  def repeatUpsample(df: DataFrame, idCol: String, stratumCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0,
      seed: Long = 42L, epochCol: String = "epoch"): DataFrame = {
    (factors.values ++ Seq(defaultFactor)).foreach(f =>
      require(f >= 0, s"repeat factors must be non-negative, got $f"))
    def fb(f: Double): Long = (f * Buckets).round
    val fbCol = factors.foldLeft(lit(fb(defaultFactor))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(fb(f))).otherwise(acc)
    }
    val copies = (fbCol / Buckets).cast("int") +
      when(hashBucket(col(idCol), Buckets, seed) < fbCol % Buckets, 1).otherwise(0)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0) // sequence(0, -1) would EMIT [0, -1]
      .withColumn(epochCol, explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Disjoint train/holdout split from one hash: rows below the eval
    * threshold form the eval set, the rest train — membership is stable
    * under corpus growth (a doc never migrates between splits when new
    * data arrives, the property that keeps eval sets uncontaminated).
    */
  def trainEvalSplit(df: DataFrame, idCol: String, evalFrac: Double,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val bucket = hashBucket(col(idCol), Buckets, seed)
    val thr = lit((evalFrac * Buckets).round)
    (df.filter(bucket >= thr), df.filter(bucket < thr))
  }

  /** Deterministic k-FOLD assignment — cross-validation / ensembling
    * splits from the same splitmix64 identity hash as [[trainEvalSplit]]:
    * `fold(id) = bucket(id, seed) mod k`, a pure function of
    * (id, seed, k). Folds are mutually exclusive, jointly exhaustive,
    * and stable under corpus growth (a doc never migrates between folds
    * when new data arrives — each fold's holdout stays uncontaminated
    * across re-runs). Folds are exactly uniform over the bucket space
    * when k divides [[Buckets]] = 10^6 (k = 2, 4, 5, 8, 10, …); for
    * other k (3, 6, 7, …) the residual bias is < k/10^6 — negligible,
    * but not the exact-equality some k enjoy. One codegen expression in
    * the scan stage, no shuffle.
    */
  def kfoldAssign(df: DataFrame, idCol: String, k: Int, seed: Long = 42L,
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn(foldCol, (hashBucket(col(idCol), Buckets, seed) % k).cast("int"))
  }

  /** EXACTLY-k deterministic sample per group (fixed-size eval slices,
    * per-domain quotas): the k rows with the smallest splitmix64(id)
    * per group, doc-id tiebreak. Same auditability as [[hashSample]] —
    * membership is a pure function of (group's id set, seed, k) — but
    * with a hard size guarantee rate-based sampling can't give.
    *
    * Scale shape: a bounded top-k heap per group (Catalyst's CollectTopK
    * via `graftbridge.collectTopK`) — partial aggregation trims to k
    * BEFORE the shuffle, so the exchange carries ≤ k rows per
    * (partition, group) instead of the full group a window row_number
    * would sort. Returns (groupCol, idCol) pairs; join back for payloads.
    */
  def reservoirPerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int, seed: Long = 42L): DataFrame =
    // Catalyst-native bounded heap (graftbridge.collectTopK — k smallest
    // (bucket, id) structs, partials trimmed to k before the shuffle):
    // same keying and tie order as the former typed TopKAgg pipeline,
    // without its per-row encoder round trip (r20 optimization round)
    df.select(col(groupCol).cast("string").as(groupCol),
        hashBucket(col(idCol), Buckets, seed).as("__b"), col(idCol).cast("long").as("__id"))
      .groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graftbridge.collectTopK(
        struct(col("__b").as("_1"), col("__id").as("_2")), k).as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col("t._2").as(idCol), col(groupCol))

  /** WEIGHTED exactly-k reservoir per group — Efraimidis–Spirakis A-ES
    * with the deterministic hash as the uniform draw: keep the k rows
    * with the LARGEST `ln(u) / w` (order-equivalent to the classical
    * u^(1/w) key, but in ln parity any engine replays), where
    * `u = (splitmix64_bucket(id) + 1) / 10^6 ∈ (0, 1]`. Higher weight →
    * higher inclusion odds, exactly the A-ES law — the
    * quality-score-weighted or length-weighted data selection a curation
    * mix uses when uniform-per-id sampling underweights what matters.
    * Same auditability as [[reservoirPerGroup]]: membership is a pure
    * function of (ids, weights, seed, k). Exact key ties break to the
    * smaller id.
    *
    * Weights must be > 0 — a nonpositive weight fails the JOB loudly
    * (`raise_error` in the key expression); silently dropping or
    * clamping such rows would bias the sample behind the caller's back.
    *
    * Scale shape: the s4 bounded-heap class (Catalyst's CollectTopK —
    * partials trim to k before the shuffle). Returns (idCol, groupCol,
    * es_key) — the key is exposed so downstream can re-verify or merge
    * reservoirs (A-ES keys are mergeable by construction).
    */
  def weightedReservoirPerGroup(df: DataFrame, idCol: String, weightCol: String,
      groupCol: String, k: Int, seed: Long = 42L): DataFrame = {
    val u = (hashBucket(col(idCol), Buckets, seed) + 1).cast("double") / lit(Buckets.toDouble)
    val key = when(col(weightCol) > 0, log(u) / col(weightCol).cast("double"))
      .otherwise(raise_error(concat(
        lit(s"weightedReservoirPerGroup: nonpositive weight in '$weightCol' for id "),
        col(idCol).cast("string"))))
    // Catalyst-native bounded heap over (−key, id): k smallest = the k
    // LARGEST A-ES keys with the smaller-id tiebreak, exactly the former
    // typed TopKAgg keying, minus its per-row encoder round trip (r20)
    df.select(col(groupCol).cast("string").as(groupCol),
        key.as("__k"), col(idCol).cast("long").as("__id"))
      .groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graftbridge.collectTopK(
        struct((-col("__k")).as("_1"), col("__id").as("_2")), k).as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col("t._2").as(idCol), col(groupCol), (-col("t._1")).as("es_key"))
  }
}
