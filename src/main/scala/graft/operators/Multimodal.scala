package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns with a typed metadata struct alongside.
  *
  * The decode step is a REAL header-only parser in pure JVM
  * ([[graft.plans.MediaHeader]]): JPEG SOF frame dimensions and WAV
  * fmt/data chunk audio parameters, no codec libraries needed. Full pixel/
  * sample decode (and any model-based featurization) stays out of scope —
  * the container ships no codecs — but everything that matters at scale is
  * real: decode is an embarrassingly parallel narrow expression, and the
  * plan keeps binary columns out of shuffles (metadata is extracted first,
  * payload dropped before any wide operation).
  */
object Multimodal {

  /** Typed metadata row for a decoded media payload. nFrames: 1 for
    * images, audio sample frames for WAV, 0 for unknown payloads. */
  case class MediaMeta(id: Long, byteLen: Long, mime: String,
                       width: Int, height: Int, nFrames: Long,
                       sampleRate: Int, channels: Int)

  /** Attach an opaque binary payload column (here: utf-8 bytes of `textCol`
    * stand in for real media bytes). */
  def withBlob(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).cast("binary").as("payload"))

  /** Header-only decode: struct(mime, width, height, n_frames, sample_rate,
    * channels) from the payload's leading bytes (JPEG/WAV; unknown bytes
    * decode as octet-stream with zeroed fields rather than failing the
    * scan). */
  def decodeMeta(payload: Column): Column =
    call_function("media_header", payload)

  /** Metadata extraction: binary in, typed struct out, payload dropped
    * before anything wide happens downstream. */
  def extractMeta(df: DataFrame, idCol: String, textCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    withBlob(df, idCol, textCol)
      .select(col("id"), length(col("payload")).cast("long").as("byteLen"),
        decodeMeta(col("payload")).as("m"))
      .select(col("id"), col("byteLen"), col("m.mime").as("mime"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.n_frames").as("nFrames"),
        col("m.sample_rate").as("sampleRate"), col("m.channels").as("channels"))
      .as[MediaMeta]
  }

  /** Frame sampling plan: one output row per sampled frame index, evenly
    * spaced, at most `maxFrames` per media row. The per-frame decode is the
    * same stub; the *shape* (generate indices lazily, explode, never
    * collect) is the 100 TB-safe part. */
  def sampleFrames(meta: Dataset[MediaMeta], maxFrames: Int): DataFrame = {
    // ceil stride: floor would give step=1 for nFrames in (maxFrames,
    // 2*maxFrames) and emit up to 2*maxFrames-1 frames, breaking the cap
    val step = greatest(ceil(col("nFrames") / lit(maxFrames.toDouble)).cast("long"), lit(1L))
    meta.toDF()
      .filter(col("nFrames") > 0) // undecodable payloads have no frames
      .select(col("id"), col("nFrames"),
        explode(sequence(lit(0L), col("nFrames") - 1, step)).as("frame_idx"))
  }

  /** Per-partition batched feature extraction — the Scala analogue of a
    * pandas-batch UDF: iterate a partition in fixed-size batches so a real
    * decoder could amortize model/codec setup per batch, not per row. */
  def batchedFeatures(df: DataFrame, idCol: String, textCol: String,
                      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    withBlob(df, idCol, textCol)
      .select(col("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // STUB: a real impl would run one vectorized decode per batch.
          batch.map { case (id, bytes) =>
            (id, bytes.length.toLong, if (bytes.isEmpty) 0L else bytes.map(_.toLong & 0xFF).sum)
          }
        }
      }
      .toDF("id", "byte_len", "byte_sum")
  }
}
