package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq((1L, "tiny"), (2L, "a longer payload body here"), (3L, ""))
    .toDF("doc_id", "text")

  /** Minimal real JPEG: SOI, SOF0 (8-bit, 16x32, 3 components), EOI. */
  private val jpeg32x16: Array[Byte] = Array(
    0xFF, 0xD8, // SOI
    0xFF, 0xC0, // SOF0
    0x00, 0x11, // segment length 17
    0x08, // precision
    0x00, 0x10, // height 16
    0x00, 0x20, // width 32
    0x03, // components
    0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01, // component specs
    0xFF, 0xD9 // EOI
  ).map(_.toByte)

  /** Minimal real WAV: RIFF/WAVE, fmt (PCM, 2ch, 44100 Hz, block align 4,
    * 16-bit), data chunk of 8 bytes = 2 sample frames. */
  private val wav2ch: Array[Byte] = {
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    "RIFF".getBytes ++ le32(36 + 8) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(8) ++ Array.fill[Byte](8)(0)
  }

  test("withBlob produces a BinaryType payload of utf-8 length") {
    val df = Multimodal.withBlob(media, "doc_id", "text")
    assert(df.schema("payload").dataType == BinaryType)
    assert(df.select(length($"payload")).as[Int].collect().sorted.toSeq == Seq(0, 4, 26))
  }

  test("media_header decodes a real JPEG's SOF dimensions") {
    val df = Seq((1L, jpeg32x16)).toDF("id", "payload")
      .select($"id", Multimodal.decodeMeta($"payload").as("m"))
      .select($"id", $"m.mime", $"m.width", $"m.height", $"m.n_frames")
      .as[(Long, String, Int, Int, Long)].collect().toSeq
    assert(df == Seq((1L, "image/jpeg", 32, 16, 1L)))
  }

  test("media_header decodes a real WAV's fmt/data chunks") {
    val df = Seq((1L, wav2ch)).toDF("id", "payload")
      .select(Multimodal.decodeMeta($"payload").as("m"))
      .select($"m.mime", $"m.sample_rate", $"m.channels", $"m.n_frames")
      .as[(String, Int, Int, Long)].collect().toSeq
    assert(df == Seq(("audio/wav", 44100, 2, 2L)))
  }

  test("media_header is total: arbitrary bytes decode as octet-stream, never throw") {
    // RIFF chunk whose unsigned 32-bit size is 2^31 (negative as Int):
    // the chunk walk must stop, not drive its cursor negative and throw
    val hugeChunk = "RIFF".getBytes ++ Array[Byte](100, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array[Byte](0, 0, 0, 0x80.toByte) ++ Array.fill[Byte](16)(0)
    val blobs = Seq(
      Array.empty[Byte],
      "plain text".getBytes("UTF-8"),
      Array[Byte](0xFF.toByte, 0xD8.toByte), // truncated JPEG
      "RIFFxxxxWAVE".getBytes("UTF-8"), // WAV with no fmt chunk
      hugeChunk)
    val out = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
      .select(Multimodal.decodeMeta($"payload").as("m"))
      .select($"m.mime").as[String].collect()
    assert(out.forall(_ == "application/octet-stream"))
  }

  test("extractMeta yields typed metadata; text payloads are octet-stream") {
    val m1 = Multimodal.extractMeta(media, "doc_id", "text").collect()
    assert(m1.map(m => m.id -> m.byteLen).toMap == Map(1L -> 4L, 2L -> 26L, 3L -> 0L))
    assert(m1.forall(_.mime == "application/octet-stream"))
    assert(m1.forall(_.nFrames == 0L))
  }

  test("sampleFrames emits at most maxFrames evenly spaced indices per row") {
    val meta = Seq(
      Multimodal.MediaMeta(1L, 10L, "video/x", 64, 64, 100L, 0, 0),
      Multimodal.MediaMeta(2L, 10L, "video/x", 64, 64, 3L, 0, 0),
      Multimodal.MediaMeta(3L, 10L, "application/octet-stream", 0, 0, 0L, 0, 0)).toDS()
    val frames = Multimodal.sampleFrames(meta, 10)
    val counts = frames.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts(1L) <= 11) // ceil division can give maxFrames+1
    assert(counts(2L) == 3)
    assert(!counts.contains(3L), "undecodable payloads must sample no frames")
    val bad = frames.filter($"frame_idx" >= $"nFrames" || $"frame_idx" < 0).count()
    assert(bad == 0)
  }

  test("sampleFrames honors the cap when nFrames is between maxFrames and 2*maxFrames") {
    // nFrames=19, maxFrames=10: floor stride would emit all 19 frames
    val meta = Seq(Multimodal.MediaMeta(1L, 10L, "x", 1, 1, 19L, 0, 0)).toDS()
    val n = Multimodal.sampleFrames(meta, 10).count()
    assert(n <= 10, s"sampled $n frames for nFrames=19, cap 10")
  }

  test("batchedFeatures runs the real pixel decode through partition batches") {
    // two real images (one flat gray 100, one half-dark/half-bright) and
    // one undecodable text payload, through batchSize=2 so the partition
    // iterates in more than one batch
    val flat = encode(grayImage(16, 16, (_, _) => 100), "png")
    val split = encode(grayImage(16, 16, (x, _) => if (x < 8) 0 else 200), "png")
    val rows = Seq((1L, flat), (2L, split), (3L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.batchedFeatures(rows, "id", "payload", batchSize = 2)
      .orderBy("id").as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(true, true, false))
    assert(out(0)._4 == 100L, "flat gray image must mean to its level")
    assert(out(1)._4 == 100L, "half 0 / half 200 must mean to 100")
    assert(out(2)._4 == -1L, "undecodable payload must carry the -1 sentinel")
    assert(out.map(_._2) == Seq(flat.length.toLong, split.length.toLong, 12L))
  }

  test("batchedFeatures treats a NULL payload as a feature row, not a task failure") {
    val rows = Seq((1L, Some("bytes".getBytes("UTF-8"))), (2L, None))
      .toDF("id", "payload")
    val out = Multimodal.batchedFeatures(rows, "id", "payload")
      .orderBy("id").as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(out(1) == ((2L, 0L, false, -1L)), s"null payload row wrong: ${out(1)}")
  }

  // ---------------------------------------------------- pixel-path aHash

  private def grayImage(w: Int, h: Int, v: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, v(x, y))
    img
  }
  private def encode(img: java.awt.image.BufferedImage, fmt: String) = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("gray block of a PNG equals the hand-computed 8x8 block means exactly") {
    // 16x16: each block is a 2x2 pixel patch; v(x,y) = x*3 + y*5
    val bytes = encode(grayImage(16, 16, (x, y) => (x * 3 + y * 5) % 256), "png")
    val got = graft.plans.GrayBlock.decode(bytes)
    val exp = (for (by <- 0 until 8; bx <- 0 until 8) yield {
      val vs = for (y <- by * 2 until by * 2 + 2; x <- bx * 2 until bx * 2 + 2)
        yield (x * 3 + y * 5) % 256
      vs.sum / 4
    }).toArray
    assert(got.toSeq == exp.toSeq)
  }

  test("non-divisible dims use integer block boundaries (e.g. 10x9)") {
    val bytes = encode(grayImage(10, 9, (x, y) => x + y), "png")
    val got = graft.plans.GrayBlock.decode(bytes)
    val exp = (for (by <- 0 until 8; bx <- 0 until 8) yield {
      val (x0, x1) = (bx * 10 / 8, (bx + 1) * 10 / 8)
      val (y0, y1) = (by * 9 / 8, (by + 1) * 9 / 8)
      val vs = for (y <- y0 until y1; x <- x0 until x1) yield x + y
      (vs.sum.toLong / vs.size).toInt
    }).toArray
    assert(got.toSeq == exp.toSeq)
  }

  test("RGB images grayscale through the exact BT.601 integer weights") {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, (200 << 16) | (100 << 8) | 50)
    val got = graft.plans.GrayBlock.decode(encode(img, "png"))
    val luma = (200 * 299 + 100 * 587 + 50 * 114) / 1000
    assert(got.forall(_ == luma), s"${got.toSeq} vs $luma")
  }

  test("JPEG baseline rides the same pixel path: smooth image decodes within quantization error") {
    // constant-per-macroblock image: JPEG's DCT quantization error on a
    // flat 16x16 block is small, so the 8x8 block means land near the
    // authored values while still exercising a REAL lossy decode
    val authored = (x: Int, y: Int) => ((x / 4) * 16 + (y / 4) * 2 + 40) % 256
    val img = grayImage(32, 32, authored)
    val jpeg = encode(img, "jpg")
    val got = graft.plans.GrayBlock.decode(jpeg)
    assert(got != null, "JPEG failed to decode")
    val exp = graft.plans.GrayBlock.decode(encode(img, "png")) // exact pixels
    val maxDiff = got.zip(exp).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 4, s"JPEG block means drifted by $maxDiff")
    // and the hash is a pure function of the bytes: re-decode agrees
    assert(graft.plans.GrayBlock.decode(jpeg).toSeq == got.toSeq)
  }

  test("aHashBitsPixels: planted PNG duplicates share a hash; undecodable payloads hash null") {
    val a1 = encode(grayImage(32, 32, (x, y) => (x * 7 + y * 13) % 256), "png")
    val a2 = encode(grayImage(32, 32, (x, y) => (x * 7 + y * 13) % 256), "png")
    val b = encode(grayImage(32, 32, (x, y) => 255 - (x * 7 + y * 13) % 256), "png")
    val rows: Seq[(Long, Array[Byte])] =
      Seq((1L, a1), (2L, a2), (3L, b), (4L, Array[Byte](9, 9, 9)))
    val got = rows.toDF("id", "payload")
      .select($"id", Multimodal.aHashBitsPixels($"payload").as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).isDefined && got(1L) == got(2L), "identical pixels must collide")
    assert(got(3L).isDefined && got(1L) != got(3L), "inverted image must differ")
    assert(got(4L).isEmpty, "undecodable payload must hash null")
    assert(got(1L).get.length == 64 && got(1L).get.forall(c => c == '0' || c == '1'))
  }

  test("tiny images (under 8x8) refuse to hash rather than fabricate blocks") {
    val bytes = encode(grayImage(4, 12, (x, y) => x + y), "png")
    assert(graft.plans.GrayBlock.decode(bytes) == null)
  }
}
