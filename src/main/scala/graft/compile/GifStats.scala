package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL GIF pixel decode over an opaque binary payload: full GIF
  * variable-width LZW decompression (GIF89a appendix F — the complete
  * decoder: code widths 3..12 bits LSB-first, clear/end codes, the
  * KwKwK next-code case, deferred-clear 4096-entry tables) of the first
  * image frame, each index mapped through the active color table
  * (local overrides global), feeding the same exact integer channel
  * stats as [[RgbStats]]/[[PngStats]] — (width, height, n_px, Σr, Σg,
  * Σb). No codec library: LZW is ~60 lines of table walking, all stock
  * JVM. This closes the GIF half of the "compressed-codec pixel decode"
  * stub; with BMP, PNG and GIF real, only JPEG's DCT entropy path
  * remains codec-shaped.
  *
  * Scope (documented, everything else → NULL, never throws): first
  * image descriptor only (animation frames beyond the first are
  * composition state, not pixel stats); transparency ignored (stats are
  * pre-compositing, the [[PngStats]] alpha rule); interlace accepted —
  * row reordering permutes pixels but their channel SUMS are
  * order-free. Width/height are the FRAME's descriptor dims. Decoding
  * is streaming over the sub-block bytes with O(4096) table state;
  * truncated payloads or a corrupt code stream yield the
  * decoded-prefix stats (the [[RgbStats]] truncation contract), an
  * out-of-palette index stops at the prefix, and at most width×height
  * pixels are accumulated, so forged descriptors can't inflate n_px.
  *
  * Reference scope note: jsen (the reference) has no media path at all
  * (it validates JSON values, jsen/lib/jsen.js); this operator belongs
  * to the builder brief's multimodal mandate — decode / feature-extract
  * over opaque binary columns with the Spark-side plumbing real. */
final case class GifStats(child: Expression, frame: Int = 0)
  extends UnaryExpression with KernelCallCodegen {

  require(frame >= 0, s"graft_gif_stats: frame ($frame) must be >= 0")

  override def dataType: DataType = RgbStats.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gif_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GifStats.parse(input.asInstanceOf[Array[Byte]], frame)

  override protected def withNewChildInternal(newChild: Expression): GifStats =
    copy(child = newChild)
}

/** REAL GIF animation frame COUNT: walk the container's block structure
  * (extensions, image descriptors, local color tables, data sub-blocks)
  * counting COMPLETE image frames until the trailer — the frame-sample
  * mandate's addressing primitive ([[GifStats]]'s `frame` parameter
  * decodes the sampled frame's pixels). No LZW decode: skipping a frame
  * costs its sub-block length walk only. Truncated containers count the
  * frames whose bytes are fully present; non-GIF → NULL. */
final case class GifFrameCount(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_frame_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gif_frame_count requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GifStats.frameCount(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): GifFrameCount =
    copy(child = newChild)
}

object GifStats {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Skip `off` past a sub-block chain (lengths + 0 terminator); -1 when
    * the chain runs off the payload. */
  private def skipSubBlocks(b: Array[Byte], off0: Int): Int = {
    var off = off0
    while (true) {
      if (off >= b.length) return -1
      val n = u8(b, off)
      off += 1
      if (n == 0) return off
      off += n
    }
    -1 // unreachable
  }

  /** Skip `off` past one whole image frame (descriptor already at `off`,
    * value 0x2C): descriptor + optional local color table + LZW min-code
    * byte + data sub-blocks; -1 when any part is missing. */
  private def skipFrame(b: Array[Byte], off0: Int): Int = {
    var off = off0
    if (off + 10 > b.length) return -1
    val packed2 = u8(b, off + 9)
    off += 10
    if ((packed2 & 0x80) != 0) {
      off += 3 * (2 << (packed2 & 7))
      if (off > b.length) return -1
    }
    if (off >= b.length) return -1
    off += 1 // LZW minimum code size
    skipSubBlocks(b, off)
  }

  /** Header + global-color-table gate: (offset past GCT, gctOff, gctSize)
    * or null for non-GIF. */
  private def headerWalk(b: Array[Byte]): (Int, Int, Int) = {
    if (b == null || b.length < 13) return null
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    val packed = u8(b, 10)
    val gctFlag = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 7)
    var off = 13
    var gctOff = -1
    if (gctFlag) {
      gctOff = off
      off += 3 * gctSize
      if (off > b.length) return null
    }
    (off, gctOff, gctSize)
  }

  /** Count COMPLETE image frames (see [[GifFrameCount]]). */
  private[graft] def frameCount(b: Array[Byte]): Any = {
    val hdr = headerWalk(b)
    if (hdr == null) return null
    var off = hdr._1
    var count = 0
    while (true) {
      if (off >= b.length) return count // truncated: complete frames only
      u8(b, off) match {
        case 0x21 =>
          val next = skipSubBlocks(b, off + 2)
          if (next < 0) return count
          off = next
        case 0x2C =>
          val next = skipFrame(b, off)
          if (next < 0) return count
          count += 1
          off = next
        case 0x3B => return count // trailer
        case _ => return count    // corrupt tail: keep the prefix count
      }
    }
    count // unreachable
  }

  private[graft] def parse(b: Array[Byte], frame: Int = 0): InternalRow = {
    val hdr = headerWalk(b)
    if (hdr == null) return null
    var off = hdr._1
    val gctOff = hdr._2
    val gctSize = hdr._3
    // walk blocks to the TARGET image descriptor, skipping extensions
    // and earlier frames (their data skips by sub-block length, no decode)
    var remaining = frame
    var found = false
    while (!found) {
      if (off >= b.length) return null
      u8(b, off) match {
        case 0x21 => // extension: introducer + label + sub-blocks + 0x00
          val next = skipSubBlocks(b, off + 2)
          if (next < 0) return null
          off = next
        case 0x2C if remaining == 0 => found = true
        case 0x2C =>
          val next = skipFrame(b, off)
          if (next < 0) return null
          remaining -= 1
          off = next
        case _ => return null // trailer before the target frame, or corrupt
      }
    }
    // image descriptor: 0x2C left(2) top(2) width(2) height(2) packed(1)
    if (off + 10 > b.length) return null
    val w = le16(b, off + 5)
    val h = le16(b, off + 7)
    val packed2 = u8(b, off + 9)
    off += 10
    if (w <= 0 || h <= 0) return null
    var palOff = gctOff
    var palSize = gctSize
    if ((packed2 & 0x80) != 0) { // local color table overrides global
      palOff = off
      palSize = 2 << (packed2 & 7)
      off += 3 * palSize
      if (off > b.length) return null
    }
    if (palOff < 0) return null // no color table at all: unmappable
    if (off >= b.length) return null
    val minCode = u8(b, off)
    off += 1
    if (minCode < 2 || minCode > 8) return null
    // concatenate the data sub-blocks (bounded by the payload itself)
    val dataLen = {
      var o = off; var total = 0; var more = true
      while (more && o < b.length) {
        val n = u8(b, o); o += 1
        if (n == 0) more = false
        else { val avail = math.min(n, b.length - o); total += avail; o += avail }
      }
      total
    }
    if (dataLen == 0) return null
    val data = new Array[Byte](dataLen);
    locally {
      var o = off; var p = 0; var more = true
      while (more && o < b.length) {
        val n = u8(b, o); o += 1
        if (n == 0) more = false
        else {
          val avail = math.min(n, b.length - o)
          if (avail > 0) { System.arraycopy(b, o, data, p, avail); p += avail }
          o += avail
        }
      }
    }

    // ---- GIF-LZW decode (appendix F), prefix/suffix table walking ----
    val clear = 1 << minCode
    val endCode = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var codeSize = minCode + 1
    var next = clear + 2
    var prevCode = -1
    var firstChar = 0 // first pixel of the previously emitted string
    var bitPos = 0L
    val nBits = dataLen.toLong * 8
    val total = w.toLong * h.toLong
    var n = 0L; var sumR = 0L; var sumG = 0L; var sumB = 0L
    var halt = false

    // emit one palette index into the channel sums; false = stop (bad
    // index or frame full)
    def emit(idx: Int): Boolean = {
      if (idx < 0 || idx >= palSize) false
      else {
        val p = palOff + idx * 3
        if (p + 3 > b.length) false
        else {
          sumR += u8(b, p); sumG += u8(b, p + 1); sumB += u8(b, p + 2)
          n += 1
          n < total
        }
      }
    }

    while (!halt) {
      if (bitPos + codeSize > nBits) halt = true // ran out of bits: prefix
      else {
        // read codeSize bits LSB-first
        var code = 0
        var i = 0
        while (i < codeSize) {
          val bp = bitPos + i
          val bit = (u8(data, (bp >>> 3).toInt) >>> (bp & 7).toInt) & 1
          code |= bit << i
          i += 1
        }
        bitPos += codeSize
        if (code == clear) {
          codeSize = minCode + 1
          next = clear + 2
          prevCode = -1
        } else if (code == endCode) halt = true
        else if (prevCode == -1) {
          // first code after a clear must be a root
          if (code >= clear) halt = true
          else {
            if (!emit(code)) halt = true
            firstChar = code
            prevCode = code
          }
        } else {
          // valid existing code, or the KwKwK next-entry case
          var chain = -1
          var kwkwk = false
          if (code < next && code != clear && code != endCode) chain = code
          else if (code == next) { chain = prevCode; kwkwk = true }
          else halt = true // gap in the table: corrupt, keep the prefix
          if (!halt) {
            // unwind the chain (roots have no prefix entry)
            var sp = 0
            if (kwkwk) { stack(sp) = firstChar.toByte; sp += 1 }
            var c = chain
            while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            stack(sp) = c.toByte // the root
            firstChar = c
            // emit in string order (stack is reversed)
            while (sp >= 0 && !halt) {
              if (!emit(u8(stack, sp))) halt = true
              sp -= 1
            }
            if (next < 4096) {
              prefix(next) = prevCode
              suffix(next) = firstChar.toByte
              next += 1
              if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
            }
            prevCode = code
          }
        }
      }
    }
    if (n == 0) null
    else InternalRow(w, h, n, sumR, sumG, sumB)
  }
}
