package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.streaming.Telemetry

/** Multimodal-pipeline and streaming-analog queries.
  *
  * The multimodal oracles replay the synthetic byte arithmetic in SQL —
  * so a hash match proves the binary payloads survived the full
  * synthesize → binary column → batched decode roundtrip bit-exactly.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary image metadata through the synthesize → decode-stub pipeline.
    "m1_image_meta" -> { (s, dir) =>
      Multimodal.decodeImages(
        Multimodal.synthesizeImages(Tables.load(s, dir, "documents"), "doc_id"))
        .toDF().select(col("doc_id"), col("width"), col("height"), col("n_bytes"))
    },

    // Payload checksum — validates every payload byte made the roundtrip.
    "m2_image_checksum" -> { (s, dir) =>
      Multimodal.decodeImages(
        Multimodal.synthesizeImages(Tables.load(s, dir, "documents"), "doc_id"))
        .toDF().select(col("doc_id"), col("checksum"))
    },

    // Frame sampling over the binary payload ("video" shape).
    "m3_frame_sample" -> { (s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.synthesizeImages(Tables.load(s, dir, "documents"), "doc_id"),
        frameSize = 16, stride = 2)
    },

    // Thumbnail metadata transform.
    "m4_thumbnails" -> { (s, dir) =>
      Multimodal.thumbnailMeta(
        Multimodal.decodeImages(
          Multimodal.synthesizeImages(Tables.load(s, dir, "documents"), "doc_id")))
    },

    // Multimodal similarity search end-to-end: binary payload → batched
    // byte-histogram FEATURE extraction (a real feature, same pipeline
    // shape as a learned embedding) → brute-force cosine top-3 via the
    // vector machinery. Proves the multimodal → vector composition.
    "m5_image_knn" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      def feats(d: org.apache.spark.sql.DataFrame) =
        Multimodal.featurizeImages(Multimodal.synthesizeImages(d, "doc_id"))
      // filter BEFORE synthesize on the query side: a filter above the
      // typed mapPartitions chain can't push below it, and would
      // re-featurize the whole corpus to produce 20 broadcast rows
      graft.operators.Similarity.bruteForceKnn(
        feats(docs.filter(col("doc_id") < 20)), feats(docs),
        "doc_id", "feature", "doc_id", "feature", k = 3)
    },

    // REAL codec roundtrip (closes the r7 stub): deterministic gray
    // pixels → javax.imageio PNG encode → binary column → javax.imageio
    // decode → width/height/pixel-sum. PNG is lossless, so the decoded
    // raster must equal the generated one and the oracle replays the
    // pixel arithmetic without parsing PNG — any codec/roundtrip slip
    // (wrong dims, channel order, a single pixel) fails the hash.
    // n_bytes is deliberately NOT selected: encoded length is
    // encoder-implementation-defined, not oracle-replayable.
    "m6_png_decode" -> { (s, dir) =>
      Multimodal.decodeImages(
        Multimodal.synthesizePngImages(Tables.load(s, dir, "documents"), "doc_id"))
        .toDF().select(col("doc_id"), col("width"), col("height"),
          col("checksum").as("pixel_sum"))
    },

    // REAL resize (reference samples/ImageResize): PNG decode →
    // nearest-neighbor half-scale raster → PNG re-encode → decode again.
    // Both codec passes are real; the oracle replays the resampled
    // raster (pixel (x,y) of the thumb = source pixel (2x, 2y)) purely
    // arithmetically — a wrong sample offset, dropped row, or lossy
    // re-encode fails the pixel sum.
    "m7_png_resize" -> { (s, dir) =>
      Multimodal.decodeImages(
        Multimodal.resizeImages(
          Multimodal.synthesizePngImages(Tables.load(s, dir, "documents"), "doc_id"), 2))
        .toDF().select(col("doc_id"), col("width").as("thumb_w"),
          col("height").as("thumb_h"), col("checksum").as("pixel_sum"))
    },

    // Sliding-window telemetry stats (batch mode of the streaming
    // pipeline — the reference's per-cycle re-execution model).
    "st1_sliding_stats" -> { (s, dir) =>
      Telemetry.slidingStats(Tables.load(s, dir, "events"), "6 hours", "3 hours")
    }
  )

  val oracles: Map[String, String] = Map(
    "m1_image_meta" ->
      """SELECT doc_id,
           (16 + (doc_id * 7919) % 240)::INT AS width,
           (16 + (doc_id * 104729) % 240)::INT AS height,
           (12 + 64 + doc_id % 64)::INT AS n_bytes
         FROM documents""",
    "m2_image_checksum" ->
      """SELECT doc_id,
           (list_sum(list_transform(range(0, (64 + doc_id % 64)::INT),
                                    i -> (doc_id * 31 + i) % 256)) % 997)::BIGINT AS checksum
         FROM documents""",
    // features replayed from the synthesis formula: 16-bin histogram of
    // (doc_id*31+i) % 256 over the payload, normalized — then v1's knn.
    "m5_image_knn" ->
      """WITH f AS (SELECT doc_id, (64 + doc_id % 64) AS plen FROM documents),
         v AS (SELECT doc_id, list_transform(range(16), b ->
                 len(list_filter(range(plen), i -> ((doc_id * 31 + i) % 256) // 16 = b))::DOUBLE
                   / plen) AS v
               FROM f),
         q AS (SELECT doc_id, v FROM v WHERE doc_id < 20),
         pairs AS (
           SELECT q.doc_id AS qid, e.doc_id AS neighbor,
             list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
           FROM q JOIN v e ON e.doc_id <> q.doc_id),
         ranked AS (
           SELECT qid, neighbor, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor ASC) AS rank
           FROM pairs)
         SELECT qid, neighbor, rank::INTEGER AS rank, round(cos, 6) AS sim FROM ranked WHERE rank <= 3""",
    "m3_frame_sample" ->
      """WITH p AS (SELECT doc_id, (64 + doc_id % 64)::INT AS len FROM documents)
         SELECT doc_id, j::INT AS frame_idx,
           least(16, len - 16 * j)::INT AS frame_bytes,
           list_sum(list_transform(range(16 * j, least(16 * j + 16, len)),
                                   i -> (doc_id * 31 + i) % 256))::BIGINT AS frame_sum
         FROM p, unnest(range(0, (len + 15) // 16)) AS t(j)
         WHERE j % 2 = 0""",
    "m4_thumbnails" ->
      """SELECT doc_id,
           ((16 + (doc_id * 7919) % 240) // 2)::INT AS thumb_w,
           ((16 + (doc_id * 104729) % 240) // 2)::INT AS thumb_h
         FROM documents""",
    "m6_png_decode" ->
      """WITH d AS (SELECT doc_id, (8 + doc_id % 9)::INTEGER AS width,
                      (8 + (doc_id // 9) % 7)::INTEGER AS height
                    FROM documents),
         px AS (SELECT d.doc_id, d.width, d.height,
                  (d.doc_id * 31 + x.x * 7 + y.y * 13) % 256 AS g
                FROM d
                JOIN range(16) x(x) ON x.x < d.width
                JOIN range(14) y(y) ON y.y < d.height)
         SELECT doc_id, width, height, sum(g)::BIGINT AS pixel_sum
         FROM px GROUP BY doc_id, width, height""",
    "m7_png_resize" ->
      """WITH d AS (SELECT doc_id, (8 + doc_id % 9)::INTEGER AS w,
                      (8 + (doc_id // 9) % 7)::INTEGER AS h
                    FROM documents),
         px AS (SELECT d.doc_id, (d.w // 2)::INTEGER AS thumb_w,
                  (d.h // 2)::INTEGER AS thumb_h,
                  (d.doc_id * 31 + 2 * x.x * 7 + 2 * y.y * 13) % 256 AS g
                FROM d
                JOIN range(8) x(x) ON x.x < d.w // 2
                JOIN range(7) y(y) ON y.y < d.h // 2)
         SELECT doc_id, thumb_w, thumb_h, sum(g)::BIGINT AS pixel_sum
         FROM px GROUP BY doc_id, thumb_w, thumb_h""",
    // Sliding 6h/3h windows = union of two 6h tumbling grids offset by 3h.
    "st1_sliding_stats" ->
      """WITH both_grids AS (
           SELECT time_bucket(INTERVAL '6 hours', ts, TIMESTAMP '2024-01-01 00:00:00') AS win_start,
                  event_type, value FROM events
           UNION ALL
           SELECT time_bucket(INTERVAL '6 hours', ts, TIMESTAMP '2024-01-01 03:00:00') AS win_start,
                  event_type, value FROM events)
         SELECT win_start, event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(quantile_cont(value, 0.95), 4) AS p95_value
         FROM both_grids GROUP BY win_start, event_type"""
  )
}
