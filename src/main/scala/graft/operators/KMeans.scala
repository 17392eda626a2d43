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
    * Overflow bound: |Σ qv| ≤ n_cluster · |v|max · S — with |v| ≤ 8
    * that is safe past 10^12 rows per cluster; a corpus beyond that
    * needs a second pre-scale pass, not a different algorithm.
    */
  val QuantScale: Long = 1L << 20

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

  private def inputFingerprint(df: DataFrame): String = {
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

  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, maxIters: Int): Model = {
    val spark = df.sparkSession
    val S = QuantScale
    // One quantize pass, persisted; partition layout is whatever the scan
    // produced — integer sums make the fit order-independent, so no
    // deterministic re-layout is needed.
    val qdata = df.select(col(vecCol)).rdd
      .map(r => quantize(toVec(r, 0), S))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = qdata.first().length
      var cq: Array[Array[Long]] = df.orderBy(col(idCol)).limit(k).select(col(vecCol))
        .collect().map(r => quantize(toVec(r, 0), S))
      var iter = 0
      while (iter < maxIters) {
        val bc = spark.sparkContext.broadcast(cq)
        // assignment + partial sums in one pass; nothing but k×dim longs
        // per task leaves the executors, merged in an arbitrary-order
        // aggregate tree (exact: integer addition commutes)
        val (sums, counts) = qdata.treeAggregate((Array.fill(k, dim)(0L), Array.fill(k)(0L)))(
          seqOp = { case ((s, n), qv) =>
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

  /** Cluster assignments as a DataFrame (id, cluster). The id column
    * passes through untouched (any type); only the vector is closed over.
    */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val nearestU = udf((v: Seq[Double]) => bc.value.nearest(v.toArray))
    df.select(col(idCol), nearestU(col(vecCol).cast("array<double>")).as("cluster"))
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
    val nearestU = udf((v: Seq[Double]) => bc.value.nearest(v.toArray))
    val probesU = udf((v: Seq[Double]) => bc.value.probes(v.toArray, nprobe))

    // norms per row below the cell join — not per scored pair; ids pass
    // through untouched (any type)
    val corpusCells = corpus.select(col(idCol).as("neighbor"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", nearestU(col("cv")))
      .withColumn("cn", VectorFunctions.vecNorm(col("cv")))

    val queryCells = broadcast(
      queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
        .withColumn("cell", explode(probesU(col("qv"))))
        .withColumn("qn", VectorFunctions.vecNorm(col("qv"))))

    val scored = corpusCells.join(queryCells, "cell")
      .filter(col("qid") =!= col("neighbor"))
      .withColumn("cos", VectorFunctions.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("neighbor"), col("rank"), round(col("cos"), 6).as("sim"))
  }
}
