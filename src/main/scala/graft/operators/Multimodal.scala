package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `BinaryType` columns with a typed metadata struct alongside.
  *
  * The *decode* step (real image/audio parsing) is a STUB — the container
  * has no imaging libraries — implemented as a deterministic fake derived
  * from the bytes, clearly marked below. Everything around it (schema,
  * binary casts, per-partition batching, frame-sampling plan shape) is real
  * Spark and is what matters at scale: decode work is embarrassingly
  * parallel per-partition, and the plan keeps binary columns out of
  * shuffles (metadata is extracted first, payload dropped before any wide
  * operation).
  */
object Multimodal {

  /** Typed metadata row for a decoded media payload. */
  case class MediaMeta(id: Long, byteLen: Long, mime: String,
                       width: Int, height: Int, nFrames: Int)

  /** Attach an opaque binary payload column (here: utf-8 bytes of `textCol`
    * stand in for real media bytes). */
  def withBlob(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).cast("binary").as("payload"))

  /** STUB DECODE — deterministic fake dimensions from a hash of the bytes.
    * Real implementation would decode headers (JPEG SOF / WAV fmt / MP4
    * moov) per partition; the surrounding plan is identical. */
  def decodeMetaStub(payload: Column): Column = struct(
    length(payload).cast("long").as("byteLen"),
    lit("application/octet-stream").as("mime"),
    (pmod(xxhash64(payload), lit(1280)) + 1).cast("int").as("width"),
    (pmod(xxhash64(payload, lit(1)), lit(720)) + 1).cast("int").as("height"),
    (pmod(xxhash64(payload, lit(2)), lit(240)) + 1).cast("int").as("nFrames"))

  /** Metadata extraction: binary in, typed struct out, payload dropped
    * before anything wide happens downstream. */
  def extractMeta(df: DataFrame, idCol: String, textCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    withBlob(df, idCol, textCol)
      .select(col("id"), decodeMetaStub(col("payload")).as("m"))
      .select(col("id"), col("m.byteLen").as("byteLen"), col("m.mime").as("mime"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.nFrames").as("nFrames"))
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
      .select(col("id"), col("nFrames"),
        explode(sequence(lit(0), col("nFrames") - 1, step)).as("frame_idx"))
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
