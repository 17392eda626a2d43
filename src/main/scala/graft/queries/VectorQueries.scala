package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table (64-dim float
  * vectors). The cosine formula shape (dot / (sqrt·sqrt), double
  * arithmetic, round 6) is mirrored exactly in the DuckDB oracles.
  */
object VectorQueries {

  private val DIM = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact brute-force top-5 neighbors for the first 20 vectors.
    "v1_knn_bruteforce" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceKnn(
        e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", "vec_id", "embedding", k = 5)
    },

    // Exact all-pairs cosine >= 0.45 (embedding near-dup at this corpus's
    // similarity ceiling; data has no planted dup vectors).
    "v2_cosine_pairs" -> { (s, dir) =>
      Similarity.exactCosinePairs(Tables.load(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
    },

    // ANN (SRP-LSH) near-pairs — the scale path; approximate recall, so
    // rows-only check here and a recall spec in VectorSpec.
    "v3_ann_srp_pairs" -> { (s, dir) =>
      Similarity.annCosinePairs(Tables.load(s, dir, "embeddings"), "vec_id", "embedding", DIM, 0.45)
    },

    // Vector norms via the codegen'd VectorDot expression.
    "v4_vector_norms" -> { (s, dir) =>
      Tables.load(s, dir, "embeddings").select(
        col("vec_id"),
        round(VectorFunctions.vecNorm(col("embedding")), 6).as("norm"),
        size(col("embedding")).as("dim"))
    },

    // K-means clustering (iterative broadcast+treeAggregate Lloyd's, the
    // reference's DistributedKMeans workload) — rows-only check (cluster
    // count is stable; boundary assignments are fp-order sensitive).
    "km1_kmeans_sizes" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val model = graft.operators.KMeans.fit(e, "vec_id", "embedding", k = 8, maxIters = 5)
      graft.operators.KMeans.assign(e, "vec_id", "embedding", model)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_points"))
    },

    // IVF ANN: corpus bucketed by nearest centroid, queries probe 3 cells
    // — rows-only here; recall vs brute force asserted in ScaleOpsSpec.
    "km2_ivf_knn" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val model = graft.operators.KMeans.fit(e, "vec_id", "embedding", k = 8, maxIters = 5)
      graft.operators.KMeans.ivfKnn(
        e.filter(col("vec_id") < 20), e, "vec_id", "embedding", model, nprobe = 3, topK = 5)
    }
  )

  val oracles: Map[String, String] = Map(
    // NB: embeddings are FLOAT lists; DuckDB's list_dot_product would
    // accumulate in float while Spark casts to double — cast to DOUBLE[]
    // first so both engines do the same double arithmetic.
    "v1_knn_bruteforce" ->
      """WITH ed AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT vec_id, v FROM ed WHERE vec_id < 20),
         pairs AS (
           SELECT q.vec_id AS qid, e.vec_id AS neighbor,
             list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
           FROM q JOIN ed e ON e.vec_id <> q.vec_id),
         ranked AS (
           SELECT qid, neighbor, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor ASC) AS rank
           FROM pairs)
         SELECT qid, neighbor, rank, round(cos, 6) AS sim FROM ranked WHERE rank <= 5""",
    "v2_cosine_pairs" ->
      """WITH ed AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
         FROM ed a JOIN ed b ON a.vec_id < b.vec_id
         WHERE list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45""",
    "v4_vector_norms" ->
      """WITH ed AS (SELECT vec_id, embedding, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
         SELECT vec_id, round(sqrt(list_dot_product(v, v)), 6) AS norm,
           len(embedding) AS dim
         FROM ed"""
  )
}
