package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (per-dimension min/max) int8 quantization of embedding
  * columns — the compression step that makes a 100 TB vector corpus
  * hold 4× more vectors per executor before the ANN stage (the same
  * role FAISS's SQ8 plays ahead of IVF).
  *
  * code = floor((v - min_d) * 255 / (max_d - min_d)) - 128, computed in
  * double with exactly that operation order so the DuckDB oracle
  * replays it bit-for-bit (min/max are exact — no accumulation error —
  * and float→double widening is injective). Degenerate dimensions
  * (max == min) quantize to 0.
  *
  * Scale shape: the stats pass is a posexplode + per-dimension min/max
  * with map-side partial aggregation — shuffle traffic is `dim` rows
  * per input partition regardless of corpus size; the 1×(dim) stats row
  * is broadcast back and the encode itself is a narrow per-row
  * `transform` in the scan stage.
  */
object Quantize {

  /** Adds a `codes` array<int> column of per-dimension int8 codes. */
  def scalarQuantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val stats = df
      .select(posexplode(col(vecCol)).as(Seq("d", "v")))
      .groupBy("d")
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("d"), col("mn")))), s => s("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("d"), col("mx")))), s => s("mx")).as("mxs"))

    df.crossJoin(broadcast(stats))
      .withColumn("codes",
        zip_with(col(vecCol).cast("array<double>"),
          zip_with(col("mns"), col("mxs"), (a, b) => struct(a.as("mn"), b.as("mx"))),
          (v, s) =>
            when(s("mx") === s("mn"), lit(0))
              .otherwise((floor((v - s("mn")) * lit(255.0) / (s("mx") - s("mn"))) - 128)
                .cast("int"))))
      .drop("mns", "mxs")
  }

  /** Product quantization (the PQ in IVF-PQ): the vector splits into `m`
    * contiguous subspaces of dim/m dimensions, each subspace gets its own
    * k-centroid codebook (the deterministic quantized Lloyd's fit of
    * [[KMeans.fit]], first-k init — oracle-replayable), and a vector's
    * code is its nearest-centroid index per subspace: m·log2(k) bits per
    * vector instead of dim·32. Returns the per-subspace models and the
    * codes frame (idCol, sub_idx, code).
    *
    * Scale shape: each subspace fit is the km_fit workload on a NARROW
    * slice (broadcast centroids + integer partial sums per partition per
    * iteration; nothing corpus-sized shuffles), and encoding is one
    * map-side pass per subspace over the sliced column — the codes union
    * is scan-stage work. Codebooks are m·k·(dim/m) scalars — driver-side
    * by construction.
    */
  def productQuantize(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): (Seq[KMeans.Model], DataFrame) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val d = dim / m
    def sub(si: Int) =
      df.select(col(idCol), slice(col(vecCol), si * d + 1, d).as("__sub"))
    val models = (0 until m).map(si => KMeans.fit(sub(si), idCol, "__sub", k, iters))
    (models, pqEncode(df, idCol, vecCol, models))
  }

  /** One-pass PQ encode: every subspace's nearest-centroid index from a
    * SINGLE corpus scan (an m-way union of per-subspace assigns would
    * scan the vectors m times). Same arithmetic as [[KMeans.assign]]
    * per slice — `Model.nearest` on the double view, first-minimum tie
    * order.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      models: Seq[KMeans.Model]): DataFrame = {
    // native one-pass expression (r15): same slicing and Model.nearest
    // arithmetic as the previous interpreted UDF, no per-row Seq boxing
    // or per-subspace copyOfRange on the corpus-sized encode path
    val bc = df.sparkSession.sparkContext.broadcast(models.map(_.centroids).toArray)
    df.select(col(idCol),
        posexplode(graft.functions.CentroidFunctions.pqCodes(col(vecCol), bc))
          .as(Seq("sub_idx", "code")))
      .select(col(idCol), col("sub_idx").cast("int").as("sub_idx"),
        col("code").cast("int").as("code"))
  }

  /** Codebook export rows (sub_idx, cluster, dim_idx, value) — the
    * artifact ADC scoring and the oracle replay read back.
    */
  def pqCodebook(spark: org.apache.spark.sql.SparkSession,
      models: Seq[KMeans.Model]): DataFrame = {
    import spark.implicits._
    models.zipWithIndex.flatMap { case (model, si) =>
      model.centroids.toSeq.zipWithIndex.flatMap { case (c, ci) =>
        c.toSeq.zipWithIndex.map { case (v, di) => (si, ci, di, v) }
      }
    }.toDF("sub_idx", "cluster", "dim_idx", "value")
  }

  /** ADC (asymmetric distance) kNN over PQ codes — the PQ search path:
    * each query precomputes an m·k lookup table of exact
    * subspace-to-centroid distances (queries stay full-precision, hence
    * "asymmetric"), and a corpus vector's approximate distance is m
    * table lookups summed — no corpus vector is ever decoded.
    *
    * Scale shape: the corpus side is the CODES table (m small ints per
    * vector — 4×–100× smaller than the vectors), grouped once into
    * per-vector code arrays; the per-query LUTs (queries × m × k
    * doubles) broadcast, and scoring + the fold are map-side. The only
    * corpus-sized movement is the one codes groupBy — amortized across
    * every query batch that follows. All folds run in fixed ascending
    * order so the DuckDB oracle replays the float arithmetic exactly.
    */
  /** (qid, lut) per query: the m·k subspace-to-centroid distances,
    * (sub_idx, cluster)-ordered flat so a lookup is index si·k + code.
    */
  private def lutWideOf(queryVecs: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame): DataFrame = {
    val cb = codebook.groupBy(col("sub_idx"), col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("dim_idx"), col("value")))),
        s => s("value")).as("centroid"))
    queryVecs.select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("sub_idx"), col("cluster"),
        aggregate(
          zip_with(
            slice(col("qv"), col("sub_idx") * size(col("centroid")) + 1, size(col("centroid"))),
            col("centroid"),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("ld"))
      .groupBy(col("qid"))
      .agg(transform(array_sort(collect_list(struct(col("sub_idx"), col("cluster"), col("ld")))),
        s => s("ld")).as("lut"))
  }

  /** (neighbor, cds): each vector's m codes as a sub_idx-ordered array. */
  private def codesWideOf(codes: DataFrame, idCol: String): DataFrame =
    codes.groupBy(col(idCol).cast("long").as("neighbor"))
      .agg(transform(array_sort(collect_list(struct(col("sub_idx"), col("code")))),
        s => s("code")).as("cds"))

  /** adc_dist column: m LUT lookups folded in ascending-subspace order
    * (deterministic IEEE sequence — oracle-replayable), rounded 6.
    */
  private def adcDist(m: Int, k: Int) =
    round(
      aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, si) => acc + element_at(col("lut"),
          (si * k + element_at(col("cds"), (si + 1).cast("int")) + 1).cast("int"))),
      6).as("adc_dist")

  def pqAdcKnn(queryVecs: DataFrame, codes: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int, k: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = codesWideOf(codes, idCol)
      .crossJoin(broadcast(lutWideOf(queryVecs, idCol, vecCol, codebook)))
      .filter(col("neighbor") =!= col("qid"))
      .select(col("qid"), col("neighbor"), adcDist(m, k))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_dist").asc, col("neighbor").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
  }

  /** Full IVF-PQ search: the coarse k-means model routes each query to
    * its `nprobe` nearest cells ([[KMeans.Model.probes]]) and only the
    * code arrays of vectors IN those cells are ADC-scored — ~nprobe/k
    * of the codes table per query, with the vectors themselves never
    * decoded. The composition every production ANN stack runs
    * (coarse quantizer + PQ residual scoring, here PQ on raw slices).
    */
  def ivfPqKnn(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      coarse: KMeans.Model, nprobe: Int,
      codes: DataFrame, codebook: DataFrame, m: Int, k: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(coarse)
    // corpus routing native, query probes interpreted (queries ≪ corpus)
    val bcC = spark.sparkContext.broadcast(coarse.centroids)
    val probesU = udf((v: Seq[Double]) => bc.value.probes(v.toArray, nprobe))
    val corpusCells = corpus.select(col(idCol).cast("long").as("neighbor"),
        graft.functions.CentroidFunctions.nearestCentroid(col(vecCol), bcC).as("cell"))
    val queryCells = queries.select(col(idCol).cast("long").as("qid"),
        explode(probesU(col(vecCol).cast("array<double>"))).as("cell"))
      .join(lutWideOf(queries, idCol, vecCol, codebook), "qid")
    val scored = codesWideOf(codes, idCol)
      .join(corpusCells, "neighbor")
      .join(broadcast(queryCells), "cell")
      .filter(col("neighbor") =!= col("qid"))
      .select(col("qid"), col("neighbor"), adcDist(m, k))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_dist").asc, col("neighbor").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
  }
}
