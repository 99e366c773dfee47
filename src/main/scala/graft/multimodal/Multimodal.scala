package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column support: media payloads are opaque `binary` columns with
 * typed metadata, processed with distributed per-partition batch transforms.
 *
 * The Spark-side plumbing here — schema, partitioning, batch shape,
 * deterministic feature pipeline — is real and tested. The codec step is a
 * STUB (`decodeImageStub`): real image/audio decoding needs native codec
 * libraries that are not in this container, so "decode" derives
 * deterministic pseudo-pixels from the payload bytes. Swapping in a real
 * decoder changes only the body of that one function.
 */
object Multimodal {

  /** A media item: opaque payload + typed metadata (the multimodal schema). */
  final case class MediaItem(
      doc_id: Long,
      media_type: String, // "image" | "audio" | "video"
      data: Array[Byte],
      width: Int,
      height: Int)

  final case class MediaFeatures(doc_id: Long, features: Array[Float], feature_dim: Int)

  /**
   * STUB decoder — stands in for a real image codec (???): expands payload
   * bytes into a deterministic pseudo-pixel stream. Deterministic by
   * construction so tests and oracle runs are stable.
   */
  def decodeImageStub(data: Array[Byte]): Array[Int] = {
    val px = new Array[Int](data.length)
    var i = 0
    while (i < data.length) {
      px(i) = java.lang.Byte.toUnsignedInt(data(i))
      i += 1
    }
    px
  }

  /** 16-bucket normalized histogram over decoded pseudo-pixels — the
    * feature-extraction step of the pipeline. */
  def extractFeatures(pixels: Array[Int]): Array[Float] = {
    val hist = new Array[Float](16)
    if (pixels.isEmpty) return hist
    var i = 0
    while (i < pixels.length) {
      hist(pixels(i) / 16) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { hist(j) /= pixels.length; j += 1 }
    hist
  }

  /** Frame sampling for "video" payloads: every k-th fixed-size block.
    * (Real frame extraction is codec work — the block structure stands in.) */
  def sampleFrames(data: Array[Byte], frameSize: Int, everyK: Int): Seq[Array[Byte]] =
    data.grouped(frameSize).zipWithIndex.collect {
      case (frame, idx) if idx % everyK == 0 => frame
    }.toSeq

  /**
   * Nearest-neighbor resize over a decoded pixel array — a REAL resampling
   * algorithm (codec-independent), not a stub: only the pixels feeding it
   * come from the stub decoder. The source is treated as a row-major
   * `ceil(sqrt(n)) x rows` raster (payload length rarely matches the fake
   * metadata dims); total and deterministic for every input, including
   * empty.
   */
  def resizeNearest(pixels: Array[Int], targetW: Int, targetH: Int): Array[Int] = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val out = new Array[Int](targetW * targetH)
    if (pixels.isEmpty) return out
    val w = math.max(1, math.ceil(math.sqrt(pixels.length.toDouble)).toInt)
    val h = (pixels.length + w - 1) / w
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * h / targetH).toInt
      var x = 0
      while (x < targetW) {
        val sx = (x.toLong * w / targetW).toInt
        out(y * targetW + x) = pixels(math.min(pixels.length - 1, sy * w + sx))
        x += 1
      }
      y += 1
    }
    out
  }

  /**
   * The distributed pipeline: decode + featurize per partition, batch-shaped
   * (one iterator pass, no per-row task overhead), schema preserved by
   * Encoders. This is where `mapInPandas`-style batch processing lives in
   * Scala Spark: `mapPartitions` over a typed Dataset.
   */
  def featurize(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        val feats = extractFeatures(decodeImageStub(item.data))
        MediaFeatures(item.doc_id, feats, feats.length)
      }
    }
  }

  final case class FrameFeatures(
      doc_id: Long, frame_idx: Int, features: Array[Float], feature_dim: Int)

  /**
   * Video-shaped pipeline: sample every k-th frame per item, decode and
   * featurize each sampled frame — one flatMap iterator pass per partition
   * (rows fan OUT inside the task, no shuffle until the caller aggregates).
   */
  def frameFeaturize(
      items: Dataset[MediaItem], frameSize: Int, everyK: Int): Dataset[FrameFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.flatMap { item =>
        sampleFrames(item.data, frameSize, everyK).zipWithIndex.map {
          case (frame, idx) =>
            val feats = extractFeatures(decodeImageStub(frame))
            FrameFeatures(item.doc_id, idx, feats, feats.length)
        }
      }
    }
  }

  /**
   * Thumbnail pipeline: decode, resize to `side x side` (real nearest-
   * neighbor resampling), featurize the thumbnail. Same batch shape as
   * [[featurize]].
   */
  def thumbnailFeaturize(items: Dataset[MediaItem], side: Int): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        val thumb = resizeNearest(decodeImageStub(item.data), side, side)
        val feats = extractFeatures(thumb)
        MediaFeatures(item.doc_id, feats, feats.length)
      }
    }
  }

  /** Bridge: treat document texts as fake media payloads (the container has
    * no real media files; the bytes are opaque to the pipeline either way). */
  def documentsAsMedia(spark: SparkSession, sfDir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), lit("image").as("media_type"),
        encode(col("text"), "UTF-8").as("data"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      .as[MediaItem]
  }
}
