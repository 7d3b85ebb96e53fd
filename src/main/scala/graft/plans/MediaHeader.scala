package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Header-only media decode in pure JVM — no codec libraries, just the
  * public container formats:
  *
  *  - JPEG (ITU-T T.81): walk the marker segments from SOI; any SOF frame
  *    header carries height/width big-endian at fixed offsets.
  *  - WAV (RIFF, MS/IBM spec): chunk walk; `fmt ` carries channels and
  *    sample rate little-endian, `data` size / block-align = sample frames.
  *
  * Returns struct(mime, width, height, n_frames, sample_rate, channels);
  * unknown payloads decode as application/octet-stream with zeroed fields
  * rather than failing, so one bad blob cannot kill a 100 TB scan. Only
  * the first bytes of the payload are touched (headers), no full decode.
  *
  * Reference scope: the reference pipeline has no media decode at all
  * (text-only ETL) — this is part of the training-data extensions.
  * CodegenFallback costs one virtual call per row, off any per-element
  * hot path (same tradeoff as [[WinnowFingerprint]]).
  */
case class MediaHeader(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_header expects binary, got ${other.simpleString}")
  }

  override def dataType: DataType = MediaHeader.schema
  override def prettyName: String = "media_header"

  override def nullSafeEval(input: Any): Any =
    MediaHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): MediaHeader =
    copy(child = newChild)
}

object MediaHeader {

  val schema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  private def row(mime: String, width: Int, height: Int, nFrames: Long,
                  sampleRate: Int, channels: Int): InternalRow =
    InternalRow(UTF8String.fromString(mime), width, height, nFrames, sampleRate, channels)

  private val Unknown = row("application/octet-stream", 0, 0, 0L, 0, 0)

  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
      parseJpeg(bytes)
    else if (bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      parseWav(bytes)
    else Unknown
  }

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** ITU-T T.81 §B: segments are FF <marker> [length payload]; SOF0-15
    * (except DHT/JPG/DAC which reuse the range) carry the frame dims. */
  private def parseJpeg(b: Array[Byte]): InternalRow = {
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return Unknown // lost marker sync
      var m = b(i + 1) & 0xFF
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF } // fill bytes
      if (m == 0xD9 || m == 0xDA) return row("image/jpeg", 0, 0, 1L, 0, 0) // EOI/SOS, no SOF seen
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 } // standalone markers
      else {
        if (i + 3 >= b.length) return Unknown
        val len = be16(b, i + 2)
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (i + 8 >= b.length) return Unknown
          val height = be16(b, i + 5) // skip length(2) + precision(1)
          val width = be16(b, i + 7)
          return row("image/jpeg", width, height, 1L, 0, 0)
        }
        i += 2 + len
      }
    }
    Unknown
  }

  /** RIFF chunk walk: `fmt ` → channels/sample-rate/block-align; `data`
    * size / block-align = sample frames (audio frames, one per channel
    * group). */
  private def parseWav(b: Array[Byte]): InternalRow = {
    var i = 12
    var channels = 0
    var sampleRate = 0
    var blockAlign = 0
    var dataSize = -1L
    while (i + 8 <= b.length && (channels == 0 || dataSize < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, i + 4) // unsigned 32-bit, so keep it a Long:
      // a corrupt size >= 2^31 cast toInt would drive the cursor negative
      // and crash the scan on one bad blob — the walk must stay total.
      if (id == "fmt " && i + 24 <= b.length) {
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12).toInt
        if (i + 22 <= b.length) blockAlign = le16(b, i + 20)
      } else if (id == "data") {
        dataSize = size
      }
      val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next <= i || next > Int.MaxValue) i = b.length // corrupt size: stop
      else i = next.toInt
    }
    if (channels == 0) Unknown
    else {
      val frames = if (blockAlign > 0 && dataSize >= 0) dataSize / blockAlign else 0L
      row("audio/wav", 0, 0, frames, sampleRate, channels)
    }
  }
}
