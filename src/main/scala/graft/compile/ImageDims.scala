package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL image-header parsing over an opaque binary payload — format
  * sniffing plus dimensions, from the container headers alone (PNG IHDR,
  * JPEG SOF0/1/2/…, GIF logical screen descriptor). No codec library is
  * involved: this is pure byte parsing, so unlike the pixel-decode stage
  * (which stays honestly stubbed in [[graft.ops.Multimodal]] — no codecs
  * in-sandbox) it runs for real at any scale as a narrow projection.
  * Unrecognized / truncated / null payloads yield NULL, never throw —
  * corrupt media must not kill a 10^12-row scan. */
final case class ImageDims(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = ImageDims.outType
  // NULL for corrupt/unrecognized payloads regardless of input nullability
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dims"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_image_dims requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    ImageDims.parse(b) match {
      case null => null
      case (fmt, w, h) => InternalRow(UTF8String.fromString(fmt), w, h)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {
  val outType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** (format, width, height) or null. */
  private[graft] def parse(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    // PNG: 8-byte signature, then the IHDR chunk (length=13, type "IHDR",
    // width/height as big-endian uint32)
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A && u8(b, 7) == 0x0A &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
      return ("png", w.toInt, h.toInt)
    }
    // GIF: "GIF87a"/"GIF89a", then width/height as little-endian uint16
    if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) return null
      return ("gif", w, h)
    }
    // JPEG: SOI then marker segments; dimensions live in the first
    // start-of-frame marker (C0-C3, C5-C7, C9-CB, CD-CF)
    if (b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xFF) return null
        // any number of 0xFF fill bytes may precede a marker — consume them
        while (i + 3 < b.length && u8(b, i + 1) == 0xFF) i += 1
        if (i + 3 >= b.length) return null
        val marker = u8(b, i + 1)
        if (marker == 0xD8 || marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
          i += 2 // standalone markers carry no length
        } else if (marker == 0xD9 || marker == 0xDA) {
          return null // end of image / start of scan before any SOF
        } else {
          val isSof = (marker >= 0xC0 && marker <= 0xCF) &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (i + 8 >= b.length) return null
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            if (w <= 0 || h <= 0) return null
            return ("jpeg", w, h)
          }
          val segLen = be16(b, i + 2)
          if (segLen < 2) return null
          i += 2 + segLen
        }
      }
      return null
    }
    null
  }
}

/** REAL image pixel decode: integer channel statistics over an
  * uncompressed 24-bit BI_RGB BMP — (width, height, n_px, Σr, Σg, Σb) —
  * the brightness/solid-color/banner screens of a multimodal curation
  * pass. The image twin of [[PcmStats]]: BMP BI_RGB needs no codec, so
  * this decodes the ACTUAL pixel rows (4-byte row padding skipped,
  * bottom-up or top-down — channel sums are order-free), shrinking the
  * honest decode stub to compressed formats only. Non-BMP / compressed
  * / other depths → NULL; a pixel array truncated against the header's
  * promise decodes the whole pixels actually present. */
final case class RgbStats(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = RgbStats.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rgb_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rgb_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RgbStats.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): RgbStats =
    copy(child = newChild)
}

/** REAL image RESIZE (nearest-neighbor) of a 24-bit uncompressed BMP
  * payload to `dw`×`dh`: output pixel (x, y) samples source pixel
  * (⌊x·W/dw⌋, ⌊y·H/dh⌋) — integer floor arithmetic a SQL oracle restates
  * verbatim. Returns the resized image as `dw·dh·3` bytes of top-down
  * row-major RGB (disk BGR converted, bottom-up row order unflipped).
  *
  * Cost is O(dw·dh) sampled FETCHES per row — never a walk over the
  * source grid, so a forged header can't make it spin ([[RgbStats]]'s
  * monotone-offset discipline, taken further: offsets stay in Long and
  * every sampled pixel is bounds-checked). Contract differs from the
  * stats kernels on truncation BY DESIGN: a resize without the full
  * sampled grid is not a prefix, it's a different image — any sampled
  * pixel out of bounds → NULL, like non-BMP payloads. */
final case class BmpResize(child: Expression, dw: Int, dh: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(dw >= 1 && dw <= 4096 && dh >= 1 && dh <= 4096,
    s"graft_bmp_resize: target dims ${dw}x$dh out of [1, 4096]")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_resize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_resize requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val hdr = RgbStats.header(b)
    if (hdr == null) return null
    val (dataOff, width, rawH) = (hdr._1, hdr._2, hdr._3)
    val height = math.abs(rawH)
    val stride = (width * 3L + 3) & ~3L
    val out = new Array[Byte](dw * dh * 3)
    var y = 0
    while (y < dh) {
      val srcY = (y.toLong * height / dh).toInt
      // positive height = bottom-up on disk: image row y is disk row H-1-y
      val diskRow = if (rawH > 0) height - 1 - srcY else srcY
      var x = 0
      while (x < dw) {
        val srcX = (x.toLong * width / dw).toInt
        val off = dataOff + diskRow * stride + srcX * 3L
        if (off < 0 || off + 3 > b.length) return null
        val o = off.toInt
        val t = (y * dw + x) * 3
        out(t) = b(o + 2)     // R (disk is BGR)
        out(t + 1) = b(o + 1) // G
        out(t + 2) = b(o)     // B
        x += 1
      }
      y += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): BmpResize =
    copy(child = newChild)
}

object RgbStats {
  val outType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Shared 24-bit-uncompressed-BMP header gate: (dataOff, width, rawH)
    * for a plausible payload, null otherwise (the [[parse]] rules —
    * [[BmpResize]] reuses them verbatim). */
  private[compile] def header(b: Array[Byte]): (Long, Int, Int) = {
    // BMP file header (14) + BITMAPINFOHEADER (>= 40)
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return null
    val width = le32(b, 18).toInt  // int32 LE (negative = invalid width)
    val rawH = le32(b, 22).toInt   // negative = top-down (stats agnostic)
    val bits = le16(b, 28)
    val compression = le32(b, 30)
    if (rawH == Int.MinValue) return null // abs() would stay negative
    val height = math.abs(rawH)
    if (width <= 0 || height == 0 || bits != 24 || compression != 0L ||
        dataOff < 54 || dataOff > b.length) return null
    (dataOff, width, rawH)
  }

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    val hdr = header(b)
    if (hdr == null) return null
    val (dataOff, width, rawH) = (hdr._1, hdr._2, hdr._3)
    val height = math.abs(rawH)
    val rowBytes = width * 3L
    val stride = (rowBytes + 3) & ~3L // rows pad to 4-byte boundaries
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var n = 0L
    var y = 0
    // stride >= 4, so rowStart is monotone in y: stopping at the first
    // row that starts past the payload bounds the loop by the real byte
    // count (a forged header can't spin 2^31 empty rows or overflow Long).
    while (y < height && dataOff + y * stride + 3 <= b.length) {
      val rowStart = dataOff + y * stride
      var x = 0
      while (x < width && rowStart + x * 3 + 3 <= b.length) {
        val off = (rowStart + x * 3).toInt
        sumB += u8(b, off)      // BGR on disk
        sumG += u8(b, off + 1)
        sumR += u8(b, off + 2)
        n += 1
        x += 1
      }
      y += 1
    }
    InternalRow(width, height, n, sumR, sumG, sumB)
  }
}
