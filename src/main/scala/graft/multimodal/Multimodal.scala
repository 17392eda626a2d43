package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * [[decodeImages]] is a REAL decoder for the in-JVM formats: PNG and BMP
  * bytes go through `javax.imageio` (no native codec deps — reference
  * capability `samples/ImageResize`, `ImageBrowser`); the GFT1 synthetic
  * format keeps its arithmetic parse so the m1/m2 oracles can replay the
  * binary roundtrip in SQL. Around the decode sits the Spark plumbing a
  * production pipeline needs — binary schema, batched `mapPartitions`
  * processing (the Scala analog of Python's `mapInPandas` batch UDFs),
  * metadata structs, and narrow (shuffle-free) execution end-to-end.
  *
  * Scale notes: decode is a narrow per-partition pass — at 100 TB the
  * parallelism is the file-split count; no shuffle, no driver data. The
  * binary column is never materialized wider than one partition batch.
  */
object Multimodal {

  /** Parsed image record (what a real decoder would emit). */
  case class DecodedImage(doc_id: Long, width: Int, height: Int, n_bytes: Int, checksum: Long)

  val MAGIC: Int = 0x47465431 // "GFT1"

  /** Deterministic synthetic "image": 12-byte header (magic, width,
    * height) + seeded payload. Stands in for reading real image bytes;
    * every byte is a pure function of the id so the DuckDB oracle can
    * replay the full binary roundtrip arithmetically.
    */
  def fakeImageBytes(id: Long): Array[Byte] = {
    // floorMod: negative ids would bake negative dimensions into the
    // header (identical to % for the non-negative ids the oracles replay)
    val width = (16 + Math.floorMod(id * 7919, 240L)).toInt
    val height = (16 + Math.floorMod(id * 104729, 240L)).toInt
    val payloadLen = (64 + Math.floorMod(id, 64L)).toInt
    val buf = ByteBuffer.allocate(12 + payloadLen)
    buf.putInt(MAGIC).putInt(width).putInt(height)
    var i = 0
    while (i < payloadLen) { buf.put(((id * 31 + i) % 256).toByte); i += 1 }
    buf.array()
  }

  /** Attach a binary image column to any table with a long id column. */
  def synthesizeImages(df: DataFrame, idCol: String): Dataset[(Long, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(id => (id, fakeImageBytes(id)))
  }

  /** Real deterministic PNG: gray pixel `g(id,x,y) = (id*31 + x*7 + y*13)
    * mod 256` encoded with `javax.imageio` — an actual codec producing
    * actual PNG bytes. Dimensions and every pixel are pure functions of
    * the id, and PNG is lossless, so a DuckDB oracle can assert the full
    * encode → binary column → decode roundtrip arithmetically (m6)
    * without being able to parse PNG itself.
    */
  def pngImageBytes(id: Long): Array[Byte] = {
    // floorMod: a negative id would yield a zero/negative dimension and
    // BufferedImage throws (Scala % keeps the dividend's sign)
    val w = (8 + Math.floorMod(id, 9L)).toInt
    val h = (8 + Math.floorMod(id / 9, 7L)).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    imageIoInit
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a binary column of REAL PNG bytes to any table with a long id. */
  def synthesizePngImages(df: DataFrame, idCol: String): Dataset[(Long, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map(id => (id, pngImageBytes(id)))
  }

  /** ImageIO's default stream disk cache writes temp files per decode —
    * pure memory streams don't need it; disable once per executor JVM.
    */
  @transient private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Decode in partition batches. Real formats — PNG (8-byte signature)
    * and BMP ("BM") — decode through `javax.imageio`; the GFT1 synthetic
    * format parses its arithmetic header so the m1/m2 oracles stay
    * SQL-replayable. `checksum` semantics per format: real images sum the
    * 8-bit blue/gray channel over all pixels (bit-stable — both formats
    * are lossless); GFT1 sums payload bytes mod 997 (the original gate
    * contract). Other bytes fail loudly with the doc id in the message.
    */
  def decodeImages(images: Dataset[(Long, Array[Byte])]): Dataset[DecodedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      imageIoInit
      it.map { case (id, bytes) => decodeOne(id, bytes) }
    }
  }

  private def decodeOne(id: Long, bytes: Array[Byte]): DecodedImage = {
    val isPng = bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte
    val isBmp = bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte
    if (isPng || isBmp) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"doc $id: ImageIO failed to decode ${bytes.length}-byte image")
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
        y += 1
      }
      DecodedImage(id, img.getWidth, img.getHeight, bytes.length, sum)
    } else {
      // length check BEFORE getInt: a truncated blob would throw a bare
      // BufferUnderflowException naming neither doc nor size — the
      // contract is loud failure with the doc id
      require(bytes.length >= 12,
        s"doc $id: unrecognized image bytes (${bytes.length} bytes, no known signature)")
      val buf = ByteBuffer.wrap(bytes)
      val magic = buf.getInt()
      require(magic == MAGIC, s"doc $id: unrecognized image bytes (magic 0x${magic.toHexString})")
      val width = buf.getInt()
      val height = buf.getInt()
      var checksum = 0L
      var i = 12
      while (i < bytes.length) { checksum += (bytes(i) & 0xFF); i += 1 }
      DecodedImage(id, width, height, bytes.length, checksum % 997)
    }
  }

  /** "Resize" metadata transform (halved thumbnail dims) — demonstrates a
    * typed narrow transform over decoded records.
    */
  def thumbnailMeta(decoded: Dataset[DecodedImage]): DataFrame =
    decoded.toDF().select(
      col("doc_id"),
      greatest(col("width") / 2, lit(1)).cast("int").as("thumb_w"),
      greatest(col("height") / 2, lit(1)).cast("int").as("thumb_h"))

  /** REAL pixel resize (reference `samples/ImageResize`): nearest-neighbor
    * integer-factor downsample through the actual codec — decode, raster
    * transform (out(x,y) = in(x·factor, y·factor)), PNG re-encode — not
    * metadata arithmetic ([[thumbnailMeta]] keeps the metadata-only
    * shape). Narrow mapPartitions batch: shuffle-free, linear in pixels,
    * the m7 gate replays the resampled raster arithmetically.
    */
  def resizeImages(images: Dataset[(Long, Array[Byte])], factor: Int = 2): Dataset[(Long, Array[Byte])] = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      imageIoInit
      it.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"doc $id: ImageIO failed to decode ${bytes.length}-byte image")
        val w = math.max(img.getWidth / factor, 1)
        val h = math.max(img.getHeight / factor, 1)
        val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out.setRGB(x, y, img.getRGB(x * factor, y * factor)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        (id, bos.toByteArray)
      }
    }
  }

  /** Content FEATURE EXTRACTION: normalized byte-value histogram of the
    * payload — a real (not stubbed) feature vector computable from any
    * binary column, standing in for a learned image embedding with the
    * identical pipeline shape: batched mapPartitions featurize → the
    * vector ops ([[graft.operators.Similarity]]) downstream. Narrow,
    * shuffle-free; a production swap puts a model call in the same body.
    */
  def featurizeImages(images: Dataset[(Long, Array[Byte])], bins: Int = 16): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    require(bins >= 1 && 256 % bins == 0,
      s"bins must be a positive divisor of 256: $bins") // 256 % -16 == 0 in Java
    val width = 256 / bins
    images.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val payload = bytes.drop(12)
        val counts = new Array[Double](bins)
        payload.foreach(b => counts((b & 0xFF) / width) += 1)
        // empty/truncated payload → zero vector, not a silent NaN vector
        // (0/0) that would poison downstream cosine rankings
        val len = math.max(payload.length, 1)
        (id, counts.map(_ / len).toSeq)
      }
    }.toDF("doc_id", "feature")
  }

  /** "Video" frame sampling: treat the payload as fixed-size frames, keep
    * every `stride`-th — the mapPartitions batch shape for frame-level
    * feature extraction.
    */
  def sampleFrames(images: Dataset[(Long, Array[Byte])], frameSize: Int, stride: Int): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    require(frameSize >= 1, s"frameSize must be positive, got $frameSize")
    require(stride >= 1, s"stride must be positive, got $stride")
    images.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val payload = bytes.drop(12)
        payload.grouped(frameSize).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) =>
            // Long accumulator: an Int sum wraps negative past ~16.8 MB
            // of 0xFF bytes — video-frame-sized payloads reach that
            var fs = 0L
            var i = 0
            while (i < frame.length) { fs += (frame(i) & 0xFF); i += 1 }
            (id, idx, frame.length, fs)
          }
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "frame_sum")
  }
}
