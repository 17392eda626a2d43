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
  * against broadcast centroids; centroid update sums k×dim partials per
  * partition (map-side combine, no shuffle of the corpus) and merges them
  * on the driver in ascending partition order. That fixed merge order
  * makes the fit BITWISE deterministic for a given input and parallelism
  * (a `treeAggregate` merges partials in shuffle-arrival order, so two
  * runs over identical data can differ in float low bits — which breaks
  * replaying the model in an external oracle). Driver merge cost is
  * k×dim×P doubles; beyond ~10^4 partitions insert one order-preserving
  * pre-merge level (group partials by pi >> 10, same sorted fold).
  * Deterministic init: first k vectors by id.
  */
object KMeans {

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

  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, maxIters: Int): Model = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    // Deterministic layout: hash-partition by id and sort within each
    // partition, so every partition folds its rows in the same order on
    // every run (a plain repartition leaves within-partition order to
    // shuffle-fetch arrival). One extra sort, paid once before iterating.
    // The key is (xxhash64(id), id-as-string) — a total order that works
    // for ARBITRARY id types (a cast("long") would silently null
    // non-numeric ids and NPE at getLong).
    val data = df.select(xxhash64(col(idCol)), col(idCol).cast("string"), col(vecCol)).rdd
      .map(r => ((r.getLong(0), r.getString(1)), toVec(r, 2)))
      .repartitionAndSortWithinPartitions(new org.apache.spark.HashPartitioner(par))
      .values.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = data.first().length
      var centroids = df.orderBy(col(idCol)).limit(k).select(col(vecCol))
        .collect().map(r => toVec(r, 0))
      var iter = 0
      while (iter < maxIters) {
        val bc = spark.sparkContext.broadcast(Model(centroids))
        // per-partition partials (one pass, nothing but k×dim doubles
        // per partition leaves the executors) ...
        val partials = data.mapPartitionsWithIndex { (pi, it) =>
          val s = Array.fill(k, dim)(0.0)
          val n = Array.fill(k)(0L)
          it.foreach { v =>
            val c = bc.value.nearest(v)
            var i = 0
            while (i < dim) { s(c)(i) += v(i); i += 1 }
            n(c) += 1
          }
          Iterator((pi, (s, n)))
        }.collect()
        // ... merged on the driver in ascending partition order — the
        // fixed fold order is what makes the fit reproducible
        val sums = Array.fill(k, dim)(0.0)
        val counts = Array.fill(k)(0L)
        partials.sortBy(_._1).foreach { case (_, (s, n)) =>
          var c = 0
          while (c < k) {
            var i = 0
            while (i < dim) { sums(c)(i) += s(c)(i); i += 1 }
            counts(c) += n(c)
            c += 1
          }
        }
        centroids = Array.tabulate(k) { c =>
          if (counts(c) == 0) centroids(c)
          else { val s = sums(c); Array.tabulate(dim)(i => s(i) / counts(c)) }
        }
        bc.destroy()
        iter += 1
      }
      Model(centroids)
    } finally data.unpersist(): Unit
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
