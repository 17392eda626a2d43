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
  def scalarQuantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
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
}
