package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Pixel-path decode for the perceptual hash: full image decode →
  * integer grayscale → 8×8 block-mean downscale, returning the 64
  * luma values [[graft.operators.Multimodal.aHashBits]]' bit pipeline
  * expects (row-major, array<int>). This closes the r8 "aHash hashes
  * payload bytes, not pixels" gap: the hash input is now an actual
  * downscaled grayscale block of the decoded image.
  *
  * The decoder is the JDK's own `javax.imageio` (Java SE, present in
  * every JVM — still no THIRD-PARTY codec dependency): JPEG baseline,
  * PNG, BMP and GIF all decode through the same call. Every step after
  * decode is EXACT integer arithmetic, so an oracle that knows the
  * pixels can replay the hash bit for bit:
  *
  *  - luma: single-band rasters read their sample verbatim (no color-
  *    space round trip — `getRGB` on a gray image would gamma-convert
  *    through sRGB and change the values); multi-band pixels use the
  *    ITU-R BT.601 integer weights (r·299 + g·587 + b·114) / 1000.
  *  - blocks: x-range of block bx is [bx·W/8, (bx+1)·W/8) in integer
  *    division (likewise y), so any W, H ≥ 8 partitions exactly;
  *  - block value: sum / count, integer division.
  *
  * Undecodable payloads (not an image, or smaller than 8×8) return
  * NULL — the caller's hash is null rather than a hash of garbage, and
  * one bad blob cannot fail a 100 TB scan. Oracle-parity note: the
  * replayable gate feeds PNG (lossless — decoded pixels ≡ authored
  * pixels, so DuckDB regenerates them analytically); JPEG rides the
  * IDENTICAL code path but is spec-gated instead, since its decoded
  * pixels are quantized and only the JVM can produce them.
  * CodegenFallback: one virtual call per row around an ImageIO decode
  * that dwarfs it ([[MediaHeader]] tradeoff). */
case class GrayBlock(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_gray8x8 expects binary, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "media_gray8x8"

  override def nullSafeEval(input: Any): Any =
    GrayBlock.decode(input.asInstanceOf[Array[Byte]]) match {
      case null => null
      case arr  => new GenericArrayData(arr.map(Int.box))
    }

  override protected def withNewChildInternal(newChild: Expression): GrayBlock =
    copy(child = newChild)
}

object GrayBlock {

  /** 64 row-major 8×8 block means, or null if the payload does not
    * decode to an image of at least 8×8. */
  def decode(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null) return null // direct callers; the expression path
                                   // already null-guards via nullSafeEval
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    if (w < 8 || h < 8) return null
    val raster = img.getRaster
    val gray = raster.getNumBands == 1
    val out = new Array[Int](64)
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            sum +=
              (if (gray) raster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
                (r * 299 + g * 587 + (rgb & 0xFF) * 114) / 1000
              })
            x += 1
          }
          y += 1
        }
        out(by * 8 + bx) = (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
        bx += 1
      }
      by += 1
    }
    out
  }
}
