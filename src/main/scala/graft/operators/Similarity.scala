package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`array<float>`) — the
  * approximate-nearest-neighbor capability a training-data pipeline needs
  * (brief: brute-force cosine top-k baseline + LSH-bucketed scale path).
  *
  * Scale design: brute-force broadcasts the smaller side and never
  * shuffles the corpus — with AQE the corpus scan parallelizes freely and
  * the only shuffle is the per-query top-k window on qid. The SRP-LSH
  * path shuffles (table, bucket) keys only, turning O(n²) scoring into
  * per-bucket work, the same shape as [[Dedup.minhashNearDupPairs]].
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector against the
    * corpus. The query side is broadcast (queries ≪ corpus in the ANN
    * setting); scoring runs map-side over corpus partitions, then one
    * shuffle on qid ranks the k winners. Deterministic tiebreak on
    * neighbor id.
    */
  def bruteForceKnn(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int): DataFrame = {
    // norms materialized per row below the join (broadcast build computes
    // qn once; corpus side once per row) — not per candidate pair
    // zero-norm vectors are excluded on BOTH sides: cosine with a zero
    // vector is 0/0 = NaN, which Spark orders ABOVE every real number —
    // one all-zero corpus row would rank #1 for every query
    val q = broadcast(queries.select(col(qId).as("qid"), col(qVec).as("qv"))
      .withColumn("qn", vecNorm(col("qv"))).filter(col("qn") > 0))
    // spread only when the corpus arrives as fewer splits than cores —
    // at scale the scan's split count parallelizes the scoring for free
    val c = Dedup.spreadIfNarrow(corpus).select(col(cId).as("neighbor"), col(cVec).as("cv"))
      .withColumn("cn", vecNorm(col("cv"))).filter(col("cn") > 0)
    val scored = c.crossJoin(q)
      .filter(col("qid") =!= col("neighbor"))
      .withColumn("cos", cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor"), col("rank"), round(col("cos"), 6).as("sim"))
  }

  /** Exact all-pairs cosine above a threshold (embedding near-dup). At
    * test scale this is the blocked O(n²) product; the scale path is
    * [[srpCandidatePairs]] + this verification on candidates only.
    */
  def exactCosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // spread the streamed (non-broadcast) side across cores when it
    // arrives as a single small split — identity at real split counts
    // zero-norm rows dropped: their cosine is NaN, and NaN >= threshold
    // is TRUE under Spark's NaN ordering — they would all emit as pairs
    val a = Dedup.spreadIfNarrow(df).select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", vecNorm(col("va"))).filter(col("na") > 0)
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", vecNorm(col("vb"))).filter(col("nb") > 0)
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("sim"))
  }

  /** SRP-LSH candidate pairs: vectors colliding in any hash table.
    * Shuffles only (table:bucket) keys — no cross join.
    *
    * `maxBucketSize` drops degenerate hot buckets (near-identical or
    * zero-ish vectors all landing in one cell) before pair expansion; the
    * groupBy formulation also evaluates the SRP keying ONCE instead of on
    * both sides of a self-join. Pass `dropMetrics` to observe
    * `dropped_buckets`/`dropped_members` (see [[Dedup.observeDrops]]);
    * `maxBucketSize = Int.MaxValue` restores exact candidate enumeration.
    */
  /** SRP key width for a corpus of `n` vectors — the documented scale
    * contract `bits ≈ log2(n / targetBucket)` as code (BASELINE.md
    * round-6/round-8 probes: 2k vectors → 6 bits at ~32/bucket, 20k → 10
    * at ~20/bucket, 200k → 14 at ~12/bucket; at 10^9 rows and
    * ~100/bucket this lands in the documented 20–24 band). Expected
    * bucket population is n/2^bits per table; recall at a given width is
    * the OTHER dial (`tables` — per-table collision falls as p^bits, so
    * wider keys want more tables). Rounded to nearest (the probes' own
    * values), clamped to [1, 63] (keys pack sign bits into a Long).
    */
  /** Sentinel default for `bits` parameters: resolve via [[autoBits]]
    * from the corpus's own row count — the keying contract wired as the
    * PRODUCTION default (the r13 verdict's missing-default gap: fixed
    * literal bits re-create the v3/v6/v7 saturation economics on any
    * corpus a decade away from the literal's design point). Cost: inside
    * [[annCosinePairs]] / [[annKnnGraph]] the count runs over the
    * already-persisted projection (it warms the cache the pipeline reads
    * anyway — no extra corpus pass); a bare [[srpCandidatePairs]] call
    * with auto pays one count of its input. NOTE the auto default makes
    * these calls EAGER: the count is a Spark job at call time (and the
    * projection cache materializes with it — released after the first
    * action on the result as before, or immediately if the count itself
    * fails); pass explicit bits to keep construction fully lazy. Oracle
    * gates pin bits explicitly so replayed results never move with the
    * corpus.
    */
  val AutoBits: Int = 0

  def autoBits(n: Long, targetBucket: Int = 32): Int = {
    require(n > 0 && targetBucket > 0,
      s"autoBits needs positive n and targetBucket, got n=$n targetBucket=$targetBucket")
    val raw = math.round(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt
    math.max(1, math.min(63, raw))
  }

  def srpCandidatePairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bits: Int = AutoBits, tables: Int = 12, seed: Long = 42L,
      maxBucketSize: Int = 1000,
      dropMetrics: Option[Observation] = None): DataFrame = {
    // auto keying counts the NORM-FILTERED view — the same population
    // annCosinePairsImpl/annKnnGraph count — so the same corpus resolves
    // the same bits from every entry point near an autoBits boundary
    // (zero-norm rows still bucket in a bare call, but no downstream
    // consumer scores them: the keying math sizes to scorable vectors).
    // COST: unlike the impl paths, which count a projection they persist
    // and reuse, a bare auto call pays one extra vector-reading scan for
    // this count (the norm filter decodes every vector) on TOP of the
    // bucket pass — at scale pass explicit bits, which also keeps
    // construction lazy (the AutoBits doc)
    val kb =
      if (bits == AutoBits)
        autoBits(math.max(1L, df.filter(vecNorm(col(vecCol)) > 0).count()))
      else bits
    val buckets = df
      .select(col(idCol).as("id"), explode(srpKeys(col(vecCol), dim, kb, tables, seed)).as("bucket"))
      .groupBy("bucket")
      .agg(collect_list(col("id")).as("ids"))
    Dedup.observeDrops(buckets, size(col("ids")), maxBucketSize, dropMetrics)
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** ANN near-dup pairs: SRP-LSH candidates verified with exact cosine —
    * the 100 TB path (approximate recall, tunable via bits/tables; see
    * [[graft.functions.VectorFunctions.srpKeys]] for the collision bound;
    * size `bits` to the corpus with [[autoBits]] — the v3 gate's fixed
    * bits=6 is the oracle-replayable operating point, the v3b gate pins
    * the re-keyed scale point).
    *
    * Cache lifecycle: the internal projection cache exists to deduplicate
    * the THREE same-plan reads within one action (bucket pass + both
    * verification sides), so it is released automatically after the first
    * action that reads it — repeated calls in one session no longer
    * accumulate cached blocks. Running several actions over one result
    * (or needing deterministic release) → [[annCosinePairsReleasable]].
    */
  def annCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, threshold: Double,
      bits: Int = AutoBits, tables: Int = 12, seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val (result, base) =
      annCosinePairsImpl(df, idCol, vecCol, dim, threshold, bits, tables, seed, maxBucketSize)
    autoRelease(result, base, () => { base.unpersist(); () })
    result
  }

  /** [[annCosinePairs]] with caller-controlled cache release (the
    * `lazySaveToName` handle pattern): invoke the thunk once the last
    * action over the pairs has run. Until then the projection cache
    * stays warm, so N actions evaluate the upstream once, not 3N times.
    */
  def annCosinePairsReleasable(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, threshold: Double,
      bits: Int = AutoBits, tables: Int = 12, seed: Long = 42L,
      maxBucketSize: Int = 1000): (DataFrame, () => Unit) = {
    val (result, base) =
      annCosinePairsImpl(df, idCol, vecCol, dim, threshold, bits, tables, seed, maxBucketSize)
    (result, () => { base.unpersist(); () })
  }

  /** Shared body of the two pair forms: returns the result AND the
    * cached projection frame (the release keying both lifecycles need).
    */
  private def annCosinePairsImpl(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, threshold: Double,
      bits: Int, tables: Int, seed: Long,
      maxBucketSize: Int): (DataFrame, DataFrame) = {
    // one cached projection feeds the bucket pass AND both verification
    // sides — without it an expensive upstream lineage evaluates three
    // times per action (the d4 double-reference regression class);
    // zero-norm rows dropped here too (NaN cosine passes >= threshold)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", vecNorm(col("v"))).filter(col("n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // auto keying counts the PERSISTED projection — the count warms the
    // cache every later pass reads, so it is not an extra corpus pass;
    // if the count itself fails, release the cache before rethrowing
    // (nothing else will — the result it keys on was never returned)
    val kb =
      if (bits == AutoBits)
        try autoBits(math.max(1L, base.count()))
        catch { case t: Throwable => base.unpersist(); throw t }
      else bits
    val cands = srpCandidatePairs(base, "id", "v", dim, kb, tables, seed, maxBucketSize)
    val va = base.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val vb = base.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    val result = cands.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("sim"))
    (result, base)
  }

  /** Persistable SRP-LSH sketch of a corpus: one row per (table:bucket)
    * key with its member-id list — [[Dedup.minhashSketch]]'s vector twin,
    * completing the incremental-maintenance story on the embedding side
    * (text LSH has d10-d13, the scored index ii5-ii7; without this every
    * daily batch re-buckets the WHOLE corpus). At steady state the
    * pipeline computes this once (or maintains it), saves it to parquet,
    * and each batch screens against the saved sketch via
    * [[incrementalAnnKeep]] — the 100 TB corpus's vectors are re-read
    * only for candidate verification, never re-hashed per batch.
    *
    * The sketch bakes in (dim, bits, tables, seed): screening with
    * different parameters silently finds nothing, so `bits` has NO
    * default here — [[AutoBits]] resolution from two different frames
    * (corpus at build, batch at screen) would key the two sides
    * differently, the exact mismatch the explicit-parameter contract
    * prevents (the [[Dedup.minhashSketch]] reasoning). Zero-norm vectors
    * are excluded (they can never cosine-match — the NaN guard).
    */
  def srpSketch(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bits: Int, tables: Int = 12, seed: Long = 42L): DataFrame = {
    require(bits != AutoBits, "srpSketch: pass explicit bits (an auto-resolved sketch " +
      "cannot be screened against — the batch side would resolve a different keying)")
    Dedup.spreadIfNarrow(
        df.select(col(idCol).as("id"), col(vecCol).as("v"))
          .withColumn("n", vecNorm(col("v"))).filter(col("n") > 0))
      .select(col("id"), explode(srpKeys(col("v"), dim, bits, tables, seed)).as("bucket"))
      .groupBy("bucket")
      .agg(collect_list(col("id")).as("ids"))
  }

  /** Batch-sized maintenance for a persisted [[srpSketch]]: hash ONLY the
    * accepted batch and append its (bucket, ids) rows to the saved
    * artifact — [[Dedup.appendToMinhashSketch]]'s vector twin, closing
    * the same staleness loop: a batch [[incrementalAnnKeep]] ACCEPTS must
    * become part of what the NEXT batch screens against, at batch cost,
    * or near-dups of recent ingests pass undetected until an O(corpus)
    * re-sketch. Pass the sketch's exact (dim, bits, tables, seed) — the
    * [[srpSketch]] keying contract; `bits` has no default for the same
    * reason it has none there. Fragmentation / crash / lock semantics:
    * [[SketchArtifact]]; [[compactSrpSketch]] merges fragments.
    */
  def appendToSrpSketch(batch: DataFrame, idCol: String, vecCol: String, dim: Int,
      path: String, bits: Int, tables: Int = 12, seed: Long = 42L): Unit = {
    require(bits != AutoBits,
      "appendToSrpSketch: pass the sketch's explicit bits (see srpSketch)")
    SketchArtifact.append(srpSketch(batch, idCol, vecCol, dim, bits, tables, seed), path)
  }

  /** Merge a fragment-accumulating [[appendToSrpSketch]] artifact back to
    * one row per bucket — O(sketch), no vectors re-read; restores exact
    * per-bucket guard semantics (see [[SketchArtifact.compact]]).
    */
  def compactSrpSketch(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    SketchArtifact.compact(spark, path, Seq("bucket"))

  /** Batch-only ANN screening against a PRE-COMPUTED sketch — the vector
    * twin of [[Dedup.incrementalNearDupKeepWithSketch]]: only the new
    * batch is hashed; the existing corpus contributes its saved buckets
    * plus candidate-only vector reads for exact-cosine verification.
    * Returns the batch with verified near-matches dropped (zero-norm
    * batch rows are unmatchable and kept). `oldDf` must be the corpus
    * the sketch was built from, with the SAME (dim, bits, tables, seed).
    *
    * Scale shape (the d10 class): the batch shuffles its (table:bucket)
    * keys; the sketch join touches only shared buckets; the per-side
    * `maxBucketSize` guard bounds degenerate buckets with
    * `dropped_buckets`/`dropped_members` accounting; verification joins
    * read vectors for candidate ids only (broadcast id filters in the
    * scan stage — the corpus is re-READ but never re-shuffled).
    */
  def incrementalAnnKeep(newDf: DataFrame, oldSketch: DataFrame, oldDf: DataFrame,
      idCol: String, vecCol: String, dim: Int, threshold: Double,
      bits: Int, tables: Int = 12, seed: Long = 42L,
      maxBucketSize: Int = 1000,
      dropMetrics: Option[Observation] = None): DataFrame = {
    require(bits != AutoBits,
      "incrementalAnnKeep: pass the sketch's explicit bits (see srpSketch)")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val newBuckets = Dedup.spreadIfNarrow(
        newDf.select(col(idCol).as("id"), col(vecCol).as("v"))
          .withColumn("n", vecNorm(col("v"))).filter(col("n") > 0))
      .select(col("id"), explode(srpKeys(col("v"), dim, bits, tables, seed)).as("bucket"))
      .groupBy("bucket")
      .agg(collect_list(col("id")).as("new_ids"))
    val shared = newBuckets
      .join(oldSketch.select(col("bucket"), col("ids").as("old_ids")), "bucket")
    // per-side guard, whole-bucket loss accounting (the incrementalCore
    // convention: predicate and member count diverge on a split bucket)
    val droppedPred =
      size(col("new_ids")) > maxBucketSize || size(col("old_ids")) > maxBucketSize
    val candidates = Dedup.observeDropsWhere(
        shared, droppedPred, size(col("new_ids")) + size(col("old_ids")), dropMetrics)
      .filter(size(col("new_ids")) <= maxBucketSize && size(col("old_ids")) <= maxBucketSize)
      .select(explode(col("new_ids")).as("nid"), col("old_ids"))
      .select(col("nid"), explode(col("old_ids")).as("oid"))
      .distinct()
      .persist(lvl)
    // verification ∝ |candidates|: vectors materialize only for ids that
    // reached a shared bucket. The id joins are left to AQE (no forced
    // broadcast — the candidate set is bounded by |batch|·tables·
    // maxBucketSize, which a large daily batch can push past the
    // broadcast ceiling; AQE broadcasts exactly when it actually fits,
    // same reasoning as the anti-join below). Zero-norm guards are
    // redundant (both id sets came from norm-filtered bucketing) but
    // kept — a NaN cosine compares TRUE under Spark's ordering and
    // would match everything.
    val matched =
      try {
        val newVecs = newDf.select(col(idCol).as("nid"), col(vecCol).as("vn"))
          .join(candidates.select(col("nid")).distinct(), "nid")
          .withColumn("nn", vecNorm(col("vn"))).filter(col("nn") > 0)
        val oldVecs = oldDf.select(col(idCol).as("oid"), col(vecCol).as("vo"))
          .join(candidates.select(col("oid")).distinct(), "oid")
          .withColumn("no", vecNorm(col("vo"))).filter(col("no") > 0)
        candidates
          .join(newVecs, "nid")
          .join(oldVecs, "oid")
          .filter(cosineFromNorms(col("vn"), col("vo"), col("nn"), col("no")) >= threshold)
          .select(col("nid").as("__match_id")).distinct()
          .localCheckpoint() // eager — lets the candidate cache go
      } finally candidates.unpersist() // on failure too: nothing else releases it
    // drop list is batch-bounded; AQE picks the join strategy (the
    // nearDedupKeep reasoning — no forced broadcast)
    newDf.join(matched, col(idCol) === col("__match_id"), "left_anti")
  }

  /** ANN k-nearest-neighbor GRAPH: every vector's top-k approximate
    * cosine neighbors, candidates restricted to SRP-LSH bucket
    * collisions — the all-to-all companion of [[bruteForceKnn]] (whose
    * broadcast-queries shape assumes queries ≪ corpus). The kNN graph is
    * the substrate of embedding-space curation: SemDeDup-style cluster
    * pruning, diversity scoring, and graph-based ANN indexes all start
    * from it, and at corpus scale it can never be built all-pairs.
    *
    * Scale shape: candidates shuffle (table:bucket) keys only
    * ([[srpCandidatePairs]] — hot buckets bounded by `maxBucketSize`);
    * scoring joins candidates back to one cached projection of the
    * corpus; ranking is a bounded top-k heap per source id
    * (Catalyst's CollectTopK via `graftbridge.collectTopK` — r20: no
    * typed-encoder round trip per candidate row) whose partial
    * aggregation trims to k BEFORE the shuffle — per-id candidate lists
    * never sort through a window. Ranking compares UNROUNDED cosine (ties broken by
    * neighbor id — the v1 ordering contract); emitted `sim` is rounded
    * to 6dp. Vectors with no bucket collisions emit no rows (ANN
    * semantics — recall vs exact is the bits/tables dial, see
    * [[autoBits]]).
    */
  def annKnnGraph(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = AutoBits, tables: Int = 12, seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types._
    // The heap keys by the id's OWN type (the annCosinePairs id-preserving
    // contract): a blanket long cast would turn non-numeric ids into nulls
    // SILENTLY (Spark's string→long cast yields null) and corrupt the
    // graph. Integral ids rank through the widest integral key, float/
    // double ids through the double value (float→double is exact, so the
    // round-trip is lossless), string ids natively; anything else fails
    // loudly at call time, before any work is persisted or scheduled.
    sealed trait IdKind
    object IntegralId extends IdKind
    object FractionalId extends IdKind
    object StringId extends IdKind
    val idType = df.select(col(idCol)).schema.head.dataType
    val idKind: IdKind = idType match {
      case ByteType | ShortType | IntegerType | LongType => IntegralId
      case FloatType | DoubleType => FractionalId
      case StringType => StringId
      case other => throw new IllegalArgumentException(
        s"annKnnGraph: unsupported id column type $other for '$idCol' — use an integral, " +
          "float/double or string id (a silent numeric cast would null non-numeric ids " +
          "and corrupt the graph)")
    }
    // one cached projection feeds the bucket pass AND both scoring sides
    // (the annCosinePairs lifecycle: released after the first action)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", vecNorm(col("v"))).filter(col("n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // auto keying counts the PERSISTED projection (warms the cache the
    // bucket + scoring passes read — not an extra corpus pass); release
    // the cache if the count itself fails (the result never returns)
    val kb =
      if (bits == AutoBits)
        try autoBits(math.max(1L, base.count()))
        catch { case t: Throwable => base.unpersist(); throw t }
      else bits
    val cands = srpCandidatePairs(base, "id", "v", dim, kb, tables, seed, maxBucketSize)
    // the candidate relation is symmetric; each vector ranks neighbors in
    // BOTH directions of every collision pair
    val sym = cands.union(cands.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val scoredBase = sym
      .join(base.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), "id_b")
      .withColumn("cos", cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
    // heap entries (−cos, neighbor, cos): k smallest under (−cos, id) =
    // top-k by cos desc with id tiebreak; the third field carries the
    // un-negated score out (never reconstructed from the sort key, so a
    // −0.0 can't leak into the output). The heap is Catalyst's own
    // bounded-priority-queue aggregate (graftbridge.collectTopK): partial
    // aggregation still trims to k before the shuffle, but input rows
    // stay Tungsten rows — the former typed groupByKey+TopKAgg pipeline
    // paid a DeserializeToObject/AppendColumns encoder round trip per
    // CANDIDATE row, the n·k hot path (r20 optimization round; the id
    // still ranks through its class-widest key so every kind keys
    // identically to the typed form — struct fields compare in order,
    // doubles by the SQL double ordering the oracle's window replay
    // already uses).
    val nbKey = idKind match {
      case IntegralId => col("id_b").cast("long")
      case FractionalId => col("id_b").cast("double")
      case StringId => col("id_b")
    }
    val ranked: DataFrame = scoredBase
      .groupBy(col("id_a").as("qid"))
      .agg(graftbridge.collectTopK(
        struct((-col("cos")).as("_1"), nbKey.as("_2"), col("cos").as("_3")), k).as("top"))
    // numeric ids rank through the widest key of their class and cast
    // BACK to the input type on emit (integral→long, float/double→double
    // — both exact round trips); string ids pass through untouched
    val result = ranked
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid").cast(idType).as(idCol), col("col._2").cast(idType).as("neighbor"),
        (col("pos") + 1).cast("int").as("rank"), round(col("col._3"), 6).as("sim"))
    autoRelease(result, base, () => { base.unpersist(); () })
    result
  }

  /** Cluster-partitioned exact cosine pairs — the candidate generator of
    * SemDeDup-style semantic dedup (Abbas et al. 2023, public): instead
    * of SRP's distribution-free random-hyperplane buckets, candidates are
    * restricted to each vector's k-means CELL, which ADAPTS to the actual
    * embedding density (near-duplicates concentrate in cells by
    * construction). Takes any pre-assigned frame (`clusterCol` from
    * [[KMeans.assign]], an IVF routing, or an external partitioner), so
    * the clustering pass is priced and replayed separately.
    *
    * Scale shape: ONE shuffle of the corpus on the cell key, then
    * per-cell O(c²) scoring with c ≈ n/k — size k to the corpus exactly
    * like IVF sizes its cell count, the same bounded-cell economics as
    * [[srpCandidatePairs]]' maxBucketSize. Zero-norm vectors are dropped
    * on both sides (NaN-cosine guard, the v2 contract); emitted `sim`
    * rounds to 6dp after the threshold compares the unrounded cosine.
    */
  /** Cell count for [[clusterCosinePairs]] over a corpus of `n` vectors —
    * the semdedup scale contract as code (the [[autoBits]] analog). Total
    * cost ≈ n·k (assignment against broadcast centroids) + n²/k (the
    * within-cell pair join), minimized at k = √n → O(n^1.5) overall with
    * √n-sized cells — the flat-IVF cost law, one polynomial notch above
    * LSH's near-linear but data-adaptive where hyperplanes are blind.
    * Train the k-means model on a BOUNDED sample (centroid estimation
    * needs density, not the corpus — the published IVF training
    * convention); assignment still touches every row. Clamped to
    * [1, 2^20] — beyond ~10^12 rows the flat cells stop shrinking; use
    * the hierarchical tier ([[semDedupCellsHier]] + [[hierarchicalCells]],
    * O(n^(4/3))) there.
    */
  def semDedupCells(n: Long): Int = {
    require(n > 0, s"semDedupCells needs a positive corpus size, got $n")
    math.max(1L, math.min(1L << 20, math.round(math.sqrt(n.toDouble)))).toInt
  }

  /** Cell counts (k1, k2) for the HIERARCHICAL tier ([[hierarchicalCells]])
    * — the flat contract's next notch: with a coarse level of k1 cells
    * and a global residual-fine level of k2, total cost ≈ n·(k1 + k2)
    * (assignment) + n²/(k1·k2) (within-composite-cell pairs), minimized
    * at k1 = k2 = ∛n → O(n^(4/3)) overall with ∛n-sized cells — one
    * polynomial notch below the flat tier's O(n^1.5), and the reason to
    * go hierarchical once √n crosses [[semDedupCells]]' 2^20 clamp
    * (~10^12 rows): at that scale the flat tier's cells stop shrinking,
    * while ∛n stays inside the clamp until ~10^18. Same bounded-sample
    * training convention; each level clamps to [1, 2^20].
    */
  def semDedupCellsHier(n: Long): (Int, Int) = {
    require(n > 0, s"semDedupCellsHier needs a positive corpus size, got $n")
    val k = math.max(1L, math.min(1L << 20, math.round(math.cbrt(n.toDouble)))).toInt
    (k, k)
  }

  /** Fit the two-level SemDeDup router on a BOUNDED sample: a coarse
    * k-means (adapts to embedding density), then ONE GLOBAL fine k-means
    * on the coarse residuals (x − nearest coarse centroid) — the IVF-PQ
    * coarse+residual composition, reused here for candidate routing
    * instead of distance quantization. A shared fine codebook is what
    * keeps this distributed: per-coarse-cell fine models would need k1
    * driver-loop fits, while residuals live in one space a single fit
    * covers (their distribution is roughly centered regardless of which
    * coarse cell produced them — the published IVF-PQ observation).
    */
  def fitHierarchical(sample: DataFrame, idCol: String, vecCol: String,
      k1: Int, k2: Int, maxIters: Int = 5): (KMeans.Model, KMeans.Model) = {
    val coarse = KMeans.fit(sample, idCol, vecCol, k1, maxIters)
    val bc = sample.sparkSession.sparkContext.broadcast(coarse)
    val residU = udf { (v: Seq[Double]) =>
      val m = bc.value
      val a = v.toArray
      val c = m.centroids(m.nearest(a))
      val r = new Array[Double](a.length)
      var i = 0
      while (i < a.length) { r(i) = a(i) - c(i); i += 1 }
      r.toSeq
    }
    val resid = sample.filter(col(vecCol).isNotNull)
      .select(col(idCol), residU(col(vecCol).cast("array<double>")).as("__resid"))
    val fine = KMeans.fit(resid, idCol, "__resid", k2, maxIters)
    (coarse, fine)
  }

  /** Composite two-level cell assignment: (id, cell) with
    * cell = coarse·k2 + fine(residual) — the [[KMeans.assign]] analog for
    * the hierarchical tier, one narrow pass over the corpus (both models
    * broadcast, coarse route + residual + fine route fused in one UDF so
    * the vector column is read once). Feed the result to
    * [[clusterCosinePairs]] as its `clusterCol`: candidates must agree on
    * BOTH levels, giving ∛n-sized cells at the [[semDedupCellsHier]]
    * keying. Null vectors are dropped (the routing would NPE); zero-norm
    * rows are dropped downstream by clusterCosinePairs' NaN guard.
    */
  def hierarchicalCells(df: DataFrame, idCol: String, vecCol: String,
      coarse: KMeans.Model, fine: KMeans.Model,
      carry: Seq[String] = Nil): DataFrame = {
    // native fused expression (r15): coarse route + residual + fine
    // route in one pass over the unboxed array — same arithmetic as the
    // previous interpreted UDF (dim-ascending folds, lowest-index ties,
    // cell = coarse·k2 + fine), which was the last per-row interpreted
    // lambda on a corpus-sized hot path
    val sc = df.sparkSession.sparkContext
    val bcC = sc.broadcast(coarse.centroids)
    val bcF = sc.broadcast(fine.centroids)
    // `carry` = KMeans.assign's passthrough contract (r19): source
    // columns ride the same map-only projection instead of a
    // re-attaching self-join on the id
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol) +:
        graft.functions.CentroidFunctions.hierarchicalCellId(col(vecCol), bcC, bcF).as("cell") +:
        carry.map(col): _*)
  }

  /** `maxCellSize` drops degenerate hot CELLS before pair expansion —
    * the [[srpCandidatePairs]] `maxBucketSize` analog on the SemDeDup
    * side. The √n sizing contract ([[semDedupCells]]) assumes balanced
    * cells; a near-dup-heavy corpus collapses mass into few cells and one
    * degenerate cell makes the within-cell join O(c²) UNBOUNDED — exactly
    * the blowup the SRP hot-bucket guard exists to stop. The default
    * (10k members → ≤5·10⁷ cosines in that cell's task) covers the
    * contract path (c ≈ √n) to n ≈ 10⁸; beyond that go hierarchical (see
    * [[semDedupCells]]' clamp note). Pass `dropMetrics` to observe
    * `dropped_buckets`/`dropped_members`; `Int.MaxValue` restores exact
    * per-cell enumeration. The cell-size pass shuffles only (cell, count)
    * partials; the allowed-cell join strategy is left to AQE — it
    * broadcasts at flat-tier cell counts (≤ 2^20 by [[semDedupCells]]'
    * clamp) and falls back to a co-partitioned shuffle join at the
    * hierarchical tier's ~n^(2/3) composite cells, where a forced
    * broadcast would blow the driver at the very scales that tier exists
    * for. Either way no corpus-sized shuffle is added beyond the
    * cell-key shuffle the pair join itself performs.
    */
  def clusterCosinePairs(assigned: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, threshold: Double,
      maxCellSize: Int = 10000,
      dropMetrics: Option[Observation] = None): DataFrame = {
    // one cached projection feeds BOTH sides of the cell self-join (the
    // annCosinePairs lifecycle: released after the first action) — the
    // caller's upstream is typically the k-means assignment UDF over the
    // whole corpus, which would otherwise execute twice per action
    val base = assigned
      .select(col(clusterCol).as("__cell"), col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", vecNorm(col("v"))).filter(col("n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cellSizes = base.groupBy(col("__cell")).agg(count(lit(1)).as("__csize"))
    val allowed = Dedup.observeDropsWhere(
        cellSizes, col("__csize") > maxCellSize, col("__csize"), dropMetrics)
      .filter(col("__csize") > 1 && col("__csize") <= maxCellSize)
      .select(col("__cell"))
    val a = base.select(col("__cell"), col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
      .join(allowed, "__cell")
    val b = base.select(col("__cell"), col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    val result = a.join(b, "__cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("sim"))
    autoRelease(result, base, () => { base.unpersist(); () })
    result
  }

  /** The [[incrementalSemDedupKeep]] analog of the sketch appends: fold a
    * screened batch's ASSIGNED rows into the persisted assigned-corpus
    * table, so the next batch's old side includes everything admitted so
    * far — without this the SemDeDup screen, like the un-maintained
    * sketches, silently compares against a snapshot that excludes every
    * batch since the last full re-assign. The rows must carry the same
    * columns as the saved table and be routed by the SAME fixed router
    * model (the [[incrementalSemDedupKeep]] contract — a re-fit would
    * re-key every cell and no append can fix that). Appends serialize
    * under the [[SketchArtifact]] lock; re-appending after a crash is
    * screen-idempotent (duplicate old-side rows add candidate pairs the
    * match distinct collapses).
    */
  def appendAssigned(batchAssigned: DataFrame, path: String): Unit =
    SketchArtifact.append(batchAssigned, path)

  /** Incremental SemDeDup screening — [[clusterCosinePairs]]' daily-batch
    * form (the d10/v10 shape on the cell-partitioned family): both sides
    * arrive PRE-ASSIGNED with the SAME router model (a pipeline keeps a
    * fixed router; re-fitting per batch would silently re-key every
    * cell), candidates are restricted to new-vs-old within the shared
    * cell, exact cosine verifies, and the batch returns with verified
    * matches dropped. Batch-internal duplicates are deliberately NOT
    * screened here (run the batch through [[clusterCosinePairs]] /
    * [[Dedup]] first — the d10 caller contract).
    *
    * Scale shape: the batch shuffles on the cell key against the
    * corpus's assigned frame; the per-side `maxCellSize` guard bounds
    * degenerate cells with drop accounting ([[clusterCosinePairs]]'
    * guard, split per side like the incremental text pipeline); the
    * guard's cell-stat pass shuffles only (cell, count) partials.
    * Zero-norm batch rows are unmatchable and kept.
    */
  def incrementalSemDedupKeep(newAssigned: DataFrame, oldAssigned: DataFrame,
      idCol: String, vecCol: String, clusterCol: String, threshold: Double,
      maxCellSize: Int = 10000,
      dropMetrics: Option[Observation] = None): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // both projections cached: each is read twice (cell stats + the pair
    // join) and the upstream is typically the assignment UDF over raw
    // vectors; released IN-CALL once the eager match checkpoint holds
    // the result (on failure too — nothing else would release them)
    val newBase = newAssigned
      .select(col(clusterCol).as("__cell"), col(idCol).as("nid"), col(vecCol).as("vn"))
      .withColumn("nn", vecNorm(col("vn"))).filter(col("nn") > 0)
      .persist(lvl)
    val oldBase = oldAssigned
      .select(col(clusterCol).as("__cell"), col(idCol).as("oid"), col(vecCol).as("vo"))
      .withColumn("no", vecNorm(col("vo"))).filter(col("no") > 0)
      .persist(lvl)
    // per-side guard over SHARED cells only, whole-cell loss accounting
    val cellStats = newBase.groupBy(col("__cell")).agg(count(lit(1)).as("__nsz"))
      .join(oldBase.groupBy(col("__cell")).agg(count(lit(1)).as("__osz")), "__cell")
    val droppedPred = col("__nsz") > maxCellSize || col("__osz") > maxCellSize
    val allowed = Dedup.observeDropsWhere(
        cellStats, droppedPred, col("__nsz") + col("__osz"), dropMetrics)
      .filter(col("__nsz") <= maxCellSize && col("__osz") <= maxCellSize)
      .select(col("__cell"))
    val matched =
      try newBase.join(allowed, "__cell")
        .join(oldBase, "__cell")
        .filter(cosineFromNorms(col("vn"), col("vo"), col("nn"), col("no")) >= threshold)
        .select(col("nid").as("__match_id")).distinct()
        .localCheckpoint() // eager — both base caches can go
      finally { newBase.unpersist(); oldBase.unpersist() }
    // drop list is batch-bounded; AQE picks the join strategy
    newAssigned.join(matched, col(idCol) === col("__match_id"), "left_anti")
  }

  /** Cache auto-release delegated to the shared [[CacheRelease]] helper
    * (one-shot listener keyed on the CACHED frame's own relation, read
    * directly or nested inside a downstream cache).
    */
  private def autoRelease(result: DataFrame, cached: DataFrame, release: () => Unit): Unit =
    CacheRelease.autoRelease(result, cached, release)
}
