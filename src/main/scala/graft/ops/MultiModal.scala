package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque BINARY
  * columns with typed metadata; decode / feature-extraction runs batched in
  * `mapPartitions` (the Scala analog of `mapInPandas` — one decoder instance
  * per partition, not per row).
  *
  * No image/audio codecs ship in this environment, so [[FakeDecoder]] is a
  * clearly-marked deterministic STUB standing in for e.g. a JPEG decoder; the
  * Spark-side plumbing — schema, partitioning, batch shape, feature columns —
  * is real and tested, and swapping in a real decoder changes one class.
  */
object MultiModal {

  final case class MediaFeature(
      id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      brightness_bps: Long)

  /** STUB decoder: a real implementation would parse the container header
    * and decode pixels; this derives deterministic pseudo-features from the
    * bytes so the distributed plumbing is exercised end-to-end.
    */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int, Long) = {
      var h = 1469598103934665603L
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 1099511628211L; i += 1 }
      val fmt = if (bytes.nonEmpty && bytes(0) == '<'.toByte) "html"
        else if (bytes.length >= 2 && bytes(0) == 0xff.toByte) "jpeg-like"
        else "raw"
      val w = 64 + (((h >>> 8) % 1024 + 1024) % 1024).toInt
      val ht = 64 + (((h >>> 24) % 1024 + 1024) % 1024).toInt
      val brightness = ((h >>> 40) % 10000 + 10000) % 10000
      (fmt, w, ht, brightness)
    }
  }

  /** Batched feature extraction over (id BIGINT, payload BINARY). */
  def extractFeatures(media: DataFrame, idCol: String,
      payloadCol: String): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (native handles, etc.)
        it.map { case (id, bytes) =>
          val (fmt, w, h, b) = FakeDecoder.decode(bytes)
          MediaFeature(id, bytes.length.toLong, fmt, w, h, b)
        }
      }
  }

  /** Deterministic frame sampling from a byte payload: every `stride`-th
    * 16-byte window, as (id, frameIdx, frame BINARY) — the shape a video
    * pipeline fans decode work out with.
    */
  def sampleFrames(media: DataFrame, idCol: String, payloadCol: String,
      stride: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.range(0, math.max(0, bytes.length - 16), stride).zipWithIndex
          .map { case (off, idx) =>
            (id, idx, java.util.Arrays.copyOfRange(bytes, off, off + 16))
          }
      }
      .toDF("id", "frame_idx", "frame")
  }
}
