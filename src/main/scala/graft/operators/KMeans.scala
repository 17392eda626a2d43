package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed Lloyd's k-means over an embedding column — the iterative
  * workload shape of the reference's `DistributedKMeans` sample
  * (reference `samples/DistributedKMeans/DistributedKMeans.fs:54-109,
  * 427-528`: broadcast centroids, per-node partial sums, driver merge),
  * re-expressed Spark-first. Also the coarse quantizer for [[ivfKnn]].
  *
  * Scale design: each iteration is ONE pass — assignment is a narrow map
  * against broadcast centroids; the centroid update `treeAggregate`s
  * k×dim partial sums (map-side combine, no shuffle of the corpus).
  *
  * The fit runs in FIXED-POINT arithmetic: inputs quantize once to
  * `qv_i = floor(v_i · S + 0.5)` longs ([[QuantScale]]) and every
  * centroid sum is an exact integer. Integer addition commutes, so the
  * fit is deterministic under ANY partition layout, task order, or
  * aggregate tree shape — no deterministic-layout shuffle or ordered
  * driver merge needed (the r4 design paid one extra corpus sort for the
  * same guarantee, and still couldn't be replayed off-JVM). Assignment
  * distances fold dequantized doubles dim-ascending — the identical
  * left-to-right IEEE sequence a DuckDB `list_reduce` runs — and the
  * centroid divide is truncating integer division, identical to
  * DuckDB's `//`. Net effect: an external SQL oracle replays the ENTIRE
  * iterative fit bit-for-bit (the km0 gate). Deterministic init: first
  * k vectors by id.
  */
object KMeans {

  /** Fixed-point scale (2^20): quantization granularity ~1e-6, and
    * centroid values `cq/S` are exact in double (power-of-two divide).
    * Overflow bound: the rounded mean computes `2·Σqv + n`, so the
    * binding constraint is |2·Σ qv| < 2^63 with |Σ qv| ≤ n_cluster ·
    * |v|max · S — at |v| ≤ 8 that is safe to ~5·10^11 rows per cluster;
    * a corpus beyond that needs a second pre-scale pass, not a
    * different algorithm.
    */
  val QuantScale: Long = 1L << 20

  /** Init strategy for [[fit]]. */
  sealed trait Init
  /** First k vectors by id — deterministic and trivially replayable in
    * SQL; the oracle-gate path (km0 replays the whole fit from it). Poor
    * clustering quality at real scale: the first k ids are arbitrary
    * points, often co-located.
    */
  case object InitFirstK extends Init
  /** Seeded k-means|| (Bahmani et al., "Scalable K-Means++", VLDB 2012):
    * `rounds` distributed passes each sample points with probability
    * `l·d²(x,C)/φ(C)` (l = `oversample`·k), then the ≈`rounds·l`
    * candidates are weighted by their attraction counts and reduced to k
    * on the driver with a deterministic greedy weighted farthest-point
    * pass. All randomness is splitmix64(id, seed+round) — the same fit
    * on the same data is bit-identical regardless of partitioning, so
    * specs can pin results; the fit itself stays the integer Lloyd's.
    * O(rounds) corpus passes (the published algorithm's contract), each
    * a narrow map against ≤ rounds·l broadcast candidates.
    */
  final case class InitKMeansParallel(seed: Long = 42L, rounds: Int = 5,
      oversample: Int = 2) extends Init

  /** Process-wide model cache so the export query (`km0_centroids`) and
    * the dependent queries (km1/km2) replay the SAME fitted model within
    * one run — and repeated bench iterations skip refitting. Keyed by
    * (data dir, cols, k, iters, file fingerprint): the fingerprint is the
    * sorted (path, length, mtime) list of the scan's input files — pure
    * driver-side filesystem metadata, no Spark job — so a dir whose
    * contents are regenerated within one JVM is refit even when the row
    * count happens to match (a count-based fingerprint collides on any
    * same-cardinality rewrite). Callers that need a guaranteed-fresh fit
    * (bench) call [[fit]] directly.
    */
  private val modelCache = scala.collection.concurrent.TrieMap.empty[(String, String, String, Int, Int, String), Model]

  /** File-list + size + mtime fingerprint of a DataFrame's inputs —
    * shared with other per-data-dir model caches (e.g. the PQ fit in
    * VectorQueries) so an in-place re-stage of the data invalidates them
    * the same way it invalidates [[fitCached]].
    */
  private[graft] def inputFingerprint(df: DataFrame): String = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }.mkString(";")
  }

  def fitCached(df: DataFrame, dir: String, idCol: String, vecCol: String, k: Int, maxIters: Int): Model = {
    val fingerprint = inputFingerprint(df)
    modelCache.getOrElseUpdate((dir, idCol, vecCol, k, maxIters, fingerprint),
      fit(df, idCol, vecCol, k, maxIters))
  }

  /** Drop all cached models (test/bench hygiene). */
  def clearCache(): Unit = modelCache.clear()

  case class Model(centroids: Array[Array[Double]]) {
    def nearest(v: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val ctr = centroids(c)
        var d = 0.0
        var i = 0
        while (i < v.length) { val t = v(i) - ctr(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** nprobe nearest centroid ids for a query vector. */
    def probes(v: Array[Double], nprobe: Int): Seq[Int] =
      centroids.indices
        .map { c =>
          val ctr = centroids(c)
          var d = 0.0
          var i = 0
          while (i < v.length) { val t = v(i) - ctr(i); d += t * t; i += 1 }
          (c, d)
        }
        .sortBy(_._2).take(nprobe).map(_._1)
  }

  private def toVec(row: org.apache.spark.sql.Row, idx: Int): Array[Double] =
    row.getSeq[Any](idx).map {
      case f: Float  => f.toDouble
      case d: Double => d
      case n: Number => n.doubleValue()
    }.toArray

  /** Quantize a vector to fixed-point longs. `v·S` and `floor` are exact
    * IEEE double ops, so DuckDB's `floor(x::DOUBLE * S + 0.5)::BIGINT`
    * computes the identical long.
    */
  private def quantize(v: Array[Double], s: Long): Array[Long] = {
    val q = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { q(i) = math.floor(v(i) * s.toDouble + 0.5).toLong; i += 1 }
    q
  }

  /** Stable long key for a row id of any type — feeds the splitmix64
    * draws of the k-means|| init. Long/Int ids use their value; byte
    * arrays hash by CONTENT (their JVM hashCode is identity-based —
    * random per run); other types use hashCode, which is stable for the
    * primitive/String ids the tables carry (a custom id class must
    * define a content-based hashCode for the init to be reproducible).
    */
  private def idKey(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: Number => n.longValue()
    case a: Array[Byte] => java.util.Arrays.hashCode(a).toLong
    case other => if (other == null) 0L else other.hashCode().toLong
  }

  /** splitmix64(id + seed) mapped to [0, 1) — the init's only randomness
    * source (same mix chain as [[graft.functions.HashFunctions]]).
    */
  private def mix01(x: Long, seed: Long): Double = {
    var z = x + seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }

  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, maxIters: Int,
      init: Init = InitFirstK): Model = {
    val spark = df.sparkSession
    val S = QuantScale
    // One quantize pass, persisted; partition layout is whatever the scan
    // produced — integer sums make the fit order-independent, so no
    // deterministic re-layout is needed. The id key rides along for the
    // k-means|| init's deterministic sampling (8 bytes/row; unused by
    // the first-k path).
    val qdata = df.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull).rdd
      .map(r => (idKey(r.get(0)), quantize(toVec(r, 1), S)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      require(!qdata.isEmpty(), s"KMeans.fit: no non-null '$vecCol' vectors to fit")
      val dim = qdata.first()._2.length
      var cq: Array[Array[Long]] = init match {
        case InitFirstK =>
          val firstRows = df.filter(col(vecCol).isNotNull)
            .orderBy(col(idCol)).limit(k).select(col(vecCol))
            .collect().map(r => quantize(toVec(r, 0), S))
          // fewer distinct rows than k: cycle (the k-means|| init already
          // does) instead of reading past the array in the assign loop
          Array.tabulate(k)(i => firstRows(i % firstRows.length))
        case InitKMeansParallel(seed, rounds, oversample) =>
          initParallel(qdata, k, dim, S, seed, rounds, math.max(1, oversample) * k)
      }
      var iter = 0
      while (iter < maxIters) {
        val bc = spark.sparkContext.broadcast(cq)
        // assignment + partial sums in one pass; nothing but k×dim longs
        // per task leaves the executors, merged in an arbitrary-order
        // aggregate tree (exact: integer addition commutes)
        val (sums, counts) = qdata.treeAggregate((Array.fill(k, dim)(0L), Array.fill(k)(0L)))(
          seqOp = { case ((s, n), (_, qv)) =>
            val cqs = bc.value
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < k) {
              val ctr = cqs(c)
              var d = 0.0
              var i = 0
              // dequantized doubles, dim-ascending fold — the exact IEEE
              // sequence the km0 oracle's list_reduce replays
              while (i < dim) {
                val t = qv(i).toDouble / S - ctr(i).toDouble / S
                d += t * t
                i += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            var i = 0
            while (i < dim) { s(best)(i) += qv(i); i += 1 }
            n(best) += 1
            (s, n)
          },
          combOp = { case ((s1, n1), (s2, n2)) =>
            var c = 0
            while (c < k) {
              var i = 0
              while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
              n1(c) += n2(c)
              c += 1
            }
            (s1, n1)
          })
        cq = Array.tabulate(k) { c =>
          if (counts(c) == 0) cq(c)
          else {
            val s = sums(c)
            val n = counts(c)
            // rounded mean via truncating integer division — identical to
            // DuckDB's (2*sq + cnt) // (2*cnt)
            Array.tabulate(dim)(i => (2 * s(i) + n) / (2 * n))
          }
        }
        bc.destroy()
        iter += 1
      }
      Model(cq.map(_.map(_.toDouble / S)))
    } finally qdata.unpersist(): Unit
  }

  /** k-means|| candidate generation + deterministic driver-side reduction
    * (see [[InitKMeansParallel]]). Runs on the shared quantized
    * (idKey, qv) RDD; distances fold dequantized doubles exactly like the
    * fit. Per round: one cost pass (φ) + one sampling pass, candidates
    * broadcast — the corpus never shuffles. The candidate set is capped
    * deterministically (takeOrdered on the sampling draw) at 4·l per
    * round, bounding driver memory at rounds·4·l vectors.
    */
  private def initParallel(qdata: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      k: Int, dim: Int, s: Long, seed: Long, rounds: Int, l: Int): Array[Array[Long]] = {
    val sc = qdata.sparkContext
    def dist2(a: Array[Long], b: Array[Long]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { val t = a(i).toDouble / s - b(i).toDouble / s; d += t * t; i += 1 }
      d
    }
    def minD2(qv: Array[Long], cands: Array[Array[Long]]): Double = {
      var best = Double.MaxValue; var c = 0
      while (c < cands.length) { val d = dist2(qv, cands(c)); if (d < best) best = d; c += 1 }
      best
    }
    // Cost quantization: RDD.sum() merges double partials in
    // task-completion order, so a float φ would make the sampling
    // threshold layout/run-dependent. Quantized LONG costs sum exactly
    // in any order (the same trick the fit itself uses), so φ — and
    // therefore every sampling decision — is bit-stable. Overflow
    // bound: d² ≤ dim·(2·|v|max)² (≈16k at dim 64, |v| ≤ 8), ×2^20
    // ×5·10^8 points ≈ 8·10^18 — re-scale before that corpus size.
    val PhiScale = 1L << 20
    def d2q(qv: Array[Long], cands: Array[Array[Long]]): Long =
      math.floor(minD2(qv, cands) * PhiScale.toDouble + 0.5).toLong
    // deterministic "uniform" first center: the point with the smallest
    // splitmix draw (id tiebreak; see idKey for the stable-hash contract)
    val first = qdata.min()(Ordering.by { case (id, _) => (mix01(id, seed), id) })._2
    val cands = scala.collection.mutable.ArrayBuffer[Array[Long]](first)
    var r = 1
    while (r <= rounds) {
      val bc = sc.broadcast(cands.toArray)
      val phiQ = qdata.map { case (_, qv) => d2q(qv, bc.value) }.reduce(_ + _)
      if (phiQ > 0) {
        val sampled = qdata.filter { case (id, qv) =>
          mix01(id, seed + r) < l.toDouble * d2q(qv, bc.value).toDouble / phiQ.toDouble
        }.map { case (id, qv) => ((mix01(id, seed + r), id), qv) }
          // deterministic cap of the sampling tail (draw, then id tiebreak)
          .takeOrdered(4 * l)(Ordering.by(_._1))
        cands ++= sampled.map(_._2)
      }
      bc.destroy()
      r += 1
    }
    // attraction weights: corpus points per nearest candidate (one pass)
    val bcAll = sc.broadcast(cands.toArray)
    val weights = qdata.map { case (_, qv) =>
      val cs = bcAll.value
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) { val d = dist2(qv, cs(c)); if (d < bestD) { bestD = d; best = c }; c += 1 }
      (best, 1L)
    }.reduceByKey(_ + _).collectAsMap()
    bcAll.destroy()
    // deterministic greedy weighted farthest-point reduction to k: start
    // at the heaviest candidate, then repeatedly take the candidate
    // maximizing weight · d²(candidate, chosen) — the k-means++ objective
    // with the argmax replacing the random draw (index tiebreak)
    val arr = cands.toArray
    val w = Array.tabulate(arr.length)(i => weights.getOrElse(i, 0L).toDouble)
    val chosen = scala.collection.mutable.ArrayBuffer(
      w.indices.maxBy(i => (w(i), -i.toDouble)))
    val inChosen = scala.collection.mutable.Set(chosen.head)
    while (chosen.length < math.min(k, arr.length)) {
      var bestI = -1; var bestScore = -1.0
      var i = 0
      while (i < arr.length) {
        if (!inChosen(i)) {
          var nd = Double.MaxValue
          chosen.foreach { j => val d = dist2(arr(i), arr(j)); if (d < nd) nd = d }
          val score = w(i) * nd
          if (score > bestScore) { bestScore = score; bestI = i }
        }
        i += 1
      }
      chosen += bestI; inChosen += bestI
    }
    // degenerate corpora can yield < k candidates — cycle what exists
    Array.tabulate(k)(i => arr(chosen(i % chosen.length)))
  }

  /** Mean squared distance of each vector to its nearest centroid — the
    * Lloyd's objective, for model-quality comparisons.
    */
  def cost(df: DataFrame, vecCol: String, model: Model): Double = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val (tot, n) = df.select(col(vecCol).cast("array<double>")).rdd.map { r =>
      val v = r.getSeq[Double](0).toArray
      val m = bc.value
      val ctr = m.centroids(m.nearest(v))
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - ctr(i); d += t * t; i += 1 }
      (d, 1L)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    tot / n
  }

  /** Cluster assignments as a DataFrame (id, cluster). The id column
    * passes through untouched (any type); only the vector is closed over.
    * Assignment is the native [[graft.functions.CentroidFunctions]]
    * expression (r15): bit-identical arithmetic to [[Model.nearest]] —
    * same dim-ascending IEEE fold, same lowest-index tie rule — without
    * the per-row Seq boxing the interpreted UDF paid on the n·k hot
    * path. Null vectors yield a null cluster (the UDF threw).
    */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model,
      carry: Seq[String] = Nil): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.centroids)
    // `carry` passes source columns through the SAME map-only projection —
    // the r19 optimization round removed the assign-then-self-join-on-id
    // shape (join output (id, cluster, carry...) ≡ this select, but the
    // join re-shuffles the corpus twice at scale for columns the
    // projection had in hand)
    df.select(col(idCol) +:
      graft.functions.CentroidFunctions.nearestCentroid(col(vecCol), bc).as("cluster") +:
      carry.map(col): _*)
  }

  /** IVF approximate nearest neighbors: corpus bucketed by nearest
    * centroid (once), each query probes its `nprobe` nearest cells and
    * scores exactly only inside them — the inverted-file ANN pattern,
    * scanning ~nprobe/k of the corpus per query.
    */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      model: Model, nprobe: Int, topK: Int): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    // corpus-side routing is the native expression (the n·k hot path);
    // the query-side probes UDF stays interpreted — it runs over the
    // broadcast-small query set, never the corpus
    val bcC = spark.sparkContext.broadcast(model.centroids)
    val probesU = udf((v: Seq[Double]) => bc.value.probes(v.toArray, nprobe))

    // norms per row below the cell join — not per scored pair; ids pass
    // through untouched (any type)
    // null vectors dropped (the probes UDF would NPE); zero-norm rows
    // dropped too — their cosine is NaN, which Spark ranks above every
    // real neighbor
    val corpusCells = corpus.select(col(idCol).as("neighbor"), col(vecCol).cast("array<double>").as("cv"))
      .filter(col("cv").isNotNull)
      .withColumn("cell", graft.functions.CentroidFunctions.nearestCentroid(col("cv"), bcC))
      .withColumn("cn", VectorFunctions.vecNorm(col("cv"))).filter(col("cn") > 0)

    val queryCells = broadcast(
      queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
        .filter(col("qv").isNotNull)
        .withColumn("cell", explode(probesU(col("qv"))))
        .withColumn("qn", VectorFunctions.vecNorm(col("qv"))).filter(col("qn") > 0))

    val scored = corpusCells.join(queryCells, "cell")
      .filter(col("qid") =!= col("neighbor"))
      .withColumn("cos", VectorFunctions.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("neighbor"), col("rank"), round(col("cos"), 6).as("sim"))
  }
}
