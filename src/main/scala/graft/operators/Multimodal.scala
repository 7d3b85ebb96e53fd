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

  /** 64-bit average hash (aHash — the classic perceptual-hash family's
    * baseline member) over a payload's leading 64 bytes, as a 64-char
    * '0'/'1' string: bit i = (byte_i · 64 > Σ bytes), i.e. byte above
    * the block mean, compared in EXACT integer arithmetic (no division,
    * no float threshold — every bit replays in any engine). On real
    * images the 64 bytes would be the 8×8 downsampled luma block; here
    * the deterministic stand-in payload feeds the same bit pipeline,
    * so the hash, grouping and Hamming machinery are real while the
    * pixel decode stays the documented stub. Payloads shorter than 64
    * bytes zero-pad (rpad on the hex lane). Built entirely from
    * codegen'd builtins (hex / substr / conv / aggregate / transform)
    * — no UDF, no new expression. The bit-string form trades 8×
    * storage for exact cross-engine replay; flip to a packed long via
    * conv() where storage dominates. */
  def aHashBits(payload: Column): Column = {
    // slice the 64-byte block BEFORE hex: a megabyte payload must cost
    // a 64-byte hex, not a 2 MB hex string that rpad then throws away
    val hx = rpad(hex(substring(payload, 1, 64)), 128, "0")
    val bytes = transform(sequence(lit(0), lit(63)),
      i => conv(hx.substr(i * 2 + 1, lit(2)), 16, 10).cast("int"))
    aHashBitsOfValues(bytes)
  }

  /** The aHash bit pipeline over an ALREADY-EXTRACTED 64-value integer
    * block: bit i = (v_i · 64 > Σ v) — exact integer arithmetic, shared
    * by the byte-lane stand-in ([[aHashBits]]) and the pixel path
    * ([[aHashBitsPixels]]). Null blocks hash to null. */
  def aHashBitsOfValues(values: Column): Column =
    // λ-bind values (and their sum) via single-element transform so the
    // input array evaluates ONCE per row — referencing it from both the
    // sum and the bit map would evaluate the tree twice (lambda
    // subexpressions are outside Spark's subexpr elimination)
    transform(array(values), bs =>
      transform(array(aggregate(bs, lit(0), (a, x) => a + x)), tot =>
        array_join(transform(bs, b =>
          when(b * 64 > tot, lit("1")).otherwise(lit("0"))), ""))
        .getItem(0))
      .getItem(0)

  /** PIXEL-path aHash: decode the payload (JPEG/PNG/BMP/GIF via the
    * JDK's ImageIO — [[graft.plans.GrayBlock]]), integer-grayscale,
    * downscale to the 8×8 block-mean luma block, then the same exact
    * bit pipeline. THIS is the classic perceptual aHash; undecodable
    * payloads yield null instead of a garbage hash (filter nulls before
    * grouping). Decode cost is per-payload and embarrassingly parallel;
    * everything downstream of the 64-int block is identical to
    * [[aHashBits]]. */
  def aHashBitsPixels(payload: Column): Column =
    aHashBitsOfValues(call_function("media_gray8x8", payload))

  /** Near-duplicate payload pairs by aHash Hamming distance ≤
    * `maxHamming` — image-style fuzzy dedup with the LSH-banding
    * shape: the 64-bit hash splits into `nBands` equal substrings,
    * candidates pair only inside equal (band, substring) buckets, and
    * exact Hamming verifies candidates only. `nBands > maxHamming`
    * makes recall EXACT by pigeonhole: ≤ maxHamming differing bits
    * cannot touch all bands, so some band matches verbatim — same
    * argument as the MinHash band join, but deterministic. Returns
    * (id_a, id_b, hamming), id_a < id_b. `maxBucket` caps degenerate
    * buckets ([[Similarity.capBuckets]] — whole-bucket drop; a bucket
    * that large means payloads with near-constant leading blocks,
    * which pair through nothing discriminating anyway). */
  def phashNearDup(df: DataFrame, idCol: String, payloadCol: String,
                   maxHamming: Int = 3, nBands: Int = 4,
                   maxBucket: Int = 1000): DataFrame = {
    require(nBands > maxHamming,
      s"nBands ($nBands) must exceed maxHamming ($maxHamming) for exact recall")
    require(64 % nBands == 0, s"nBands must divide 64: $nBands")
    require(maxHamming >= 0, s"maxHamming must be >= 0: $maxHamming")
    val w = 64 / nBands
    val sig = Checkpoints.materialize(
      df.select(col(idCol).as("id"), aHashBits(col(payloadCol)).as("bits")))
    val banded = sig.select(col("id"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            substring(col("bits"), b * w + 1, w).as("sub"))): _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.sub").as("sub"))
    val capped = Similarity.capBuckets(banded, Seq("band", "sub"), maxBucket)
    val cand = capped.select(col("band"), col("sub"), col("id").as("id_a"))
      .join(capped.select(col("band"), col("sub"), col("id").as("id_b")),
        Seq("band", "sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val ham = (a: Column, b: Column) =>
      aggregate(zip_with(split(a, ""), split(b, ""),
        (x, y) => when(x === y, 0).otherwise(1)), lit(0), (s, v) => s + v)
    cand
      .join(sig.select(col("id").as("id_a"), col("bits").as("_ba")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("bits").as("_bb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), ham(col("_ba"), col("_bb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
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
    * pandas-batch UDF: iterate a partition in fixed-size batches so the
    * decoder amortizes setup per batch, not per row. The decode is the
    * REAL pixel path ([[graft.plans.GrayBlock.decode]] — ImageIO
    * JPEG/PNG/BMP/GIF, BT.601 integer luma, 8×8 block means); per
    * payload it emits (id, byte_len, decodable, luma_mean) where
    * luma_mean is the mean of the 64 block means (-1 for undecodable
    * payloads — they are features too: a crawl shard full of them is a
    * signal, not a crash). `payloadCol` must be BinaryType (pair with
    * [[withBlob]] for the text stand-in corpus). */
  def batchedFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one decode pass per batch: ImageIO's reader registry lookup
          // and buffer churn amortize over the group, and a model-based
          // extractor would run its forward pass on exactly this slice
          batch.map { case (id, bytes) =>
            // null payloads are features too (byte_len 0, undecodable) —
            // a crawl row with a missing blob must not kill the task
            val block =
              if (bytes == null) null else graft.plans.GrayBlock.decode(bytes)
            val decodable = block != null
            val lumaMean = if (decodable) block.sum.toLong / 64 else -1L
            (id, if (bytes == null) 0L else bytes.length.toLong, decodable,
              lumaMean)
          }
        }
      }
      .toDF("id", "byte_len", "decodable", "luma_mean")
  }
}
