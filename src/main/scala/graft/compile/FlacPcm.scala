package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL FLAC audio frame decode over an opaque binary payload: the
  * complete lossless decode path — metadata walk, frame-header parse
  * (block size / sample rate / channel assignment / sample size codes,
  * UTF-8 frame numbers), subframe decode for all four types (CONSTANT,
  * VERBATIM, FIXED orders 0-4, LPC up to order 32 with quantized
  * coefficients and shift), Rice/Rice2 residual partitions including
  * escape-to-raw, wasted-bits shifts, and left-side / right-side /
  * mid-side stereo decorrelation — feeding the same exact integer
  * sample stats as [[PcmStats]]: (n_samples, peak |s|, Σ|s|, Σs²),
  * channels pooled. FLAC needs NO codec tables (unlike MP3's synthesis
  * window): Rice coding + integer predictors are pure arithmetic, so
  * the decode is exact by construction and any engine reproduces the
  * stats bit-for-bit.
  *
  * Scope (documented, everything else → NULL, never throws): sample
  * sizes 8/12/16/20/24 (direct or via STREAMINFO), up to 8 channels,
  * fixed-blocking or variable-blocking streams. CRC-8/CRC-16/MD5 are
  * not verified (stats kernel, not an integrity checker). Truncated or
  * corrupt payloads yield the decoded-prefix stats at WHOLE-FRAME
  * granularity — a frame that fails mid-decode contributes nothing and
  * stops the scan. Unary/blocksize caps bound adversarial payloads.
  *
  * Reference scope note: jsen (the reference) has no media path at all
  * (it validates JSON values, jsen/lib/jsen.js); this operator belongs
  * to the builder brief's multimodal mandate. */
final case class FlacPcm(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = PcmStats.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_pcm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_flac_pcm requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    FlacPcm.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): FlacPcm =
    copy(child = newChild)
}

object FlacPcm {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  private val MaxUnary = 1 << 20 // corrupt-stream quotient cap

  /** MSB-first bit reader; `dead` latches on exhaustion/corruption. */
  private final class BR(b: Array[Byte]) {
    var bitPos: Long = 0L
    val nBits: Long = b.length.toLong * 8
    var dead = false
    def bits(n: Int): Long = { // n <= 57
      if (dead || bitPos + n > nBits) { dead = true; return 0L }
      var v = 0L; var i = 0
      while (i < n) {
        val bp = bitPos + i
        v = (v << 1) |
          ((u8(b, (bp >>> 3).toInt) >>> (7 - (bp & 7).toInt)) & 1)
        i += 1
      }
      bitPos += n
      v
    }
    def signedBits(n: Int): Int = {
      val v = bits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    def unary(): Int = {
      var q = 0
      while (q <= MaxUnary) {
        if (dead) return -1
        if (bits(1) == 1L) return q
        q += 1
      }
      dead = true; -1
    }
    def alignByte(): Unit =
      if ((bitPos & 7) != 0) bitPos = (bitPos | 7) + 1
  }

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 8 ||
        b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    // metadata walk: collect STREAMINFO bps, find the frames offset
    var off = 4
    var streamBps = -1
    var last = false
    while (!last) {
      if (off + 4 > b.length) return null
      val hdr = u8(b, off)
      last = (hdr & 0x80) != 0
      val bt = hdr & 0x7F
      val len = (u8(b, off + 1) << 16) | (u8(b, off + 2) << 8) | u8(b, off + 3)
      if (bt == 0 && len >= 34 && off + 4 + 18 <= b.length) {
        // packed 64 bits at block offsets 10..17: rate|ch|bps|total
        var packed = 0L
        var k = 0
        while (k < 8) { packed = (packed << 8) | u8(b, off + 4 + 10 + k); k += 1 }
        streamBps = (((packed >>> 36) & 0x1F) + 1).toInt
      }
      off += 4 + len
      if (off > b.length) return null
    }

    val br = new BR(b)
    br.bitPos = off.toLong * 8
    var sumAbs = 0L; var sumSq = 0L; var n = 0L; var peak = 0

    var done = false
    while (!done) {
      br.alignByte()
      val bp = (br.bitPos >>> 3).toInt
      if (bp + 2 > b.length || u8(b, bp) != 0xFF ||
          (u8(b, bp + 1) & 0xFE) != 0xF8) { done = true }
      else {
        br.bitPos = (bp + 2).toLong * 8
        val bsCode = br.bits(4).toInt
        val srCode = br.bits(4).toInt
        val chCode = br.bits(4).toInt
        val ssCode = br.bits(3).toInt
        val resv = br.bits(1)
        // UTF-8 coded frame/sample number: skip
        val first = br.bits(8).toInt
        var lead = 0
        while (lead < 8 && ((first >>> (7 - lead)) & 1) == 1) lead += 1
        var utf8Bad = lead == 1 || lead > 7
        var k = 1
        while (!utf8Bad && k < lead) { br.bits(8); k += 1 }
        val blockSize = bsCode match {
          case 0 => -1
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => br.bits(8).toInt + 1
          case 7 => br.bits(16).toInt + 1
          case c => 256 << (c - 8)
        }
        srCode match {
          case 12 => br.bits(8)
          case 13 | 14 => br.bits(16)
          case _ => ()
        }
        val srBad = srCode == 15
        br.bits(8) // CRC-8, unverified
        val channels = if (chCode <= 7) chCode + 1 else 2
        val baseBps = ssCode match {
          case 0 => streamBps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case _ => -1
        }
        if (resv != 0 || utf8Bad || srBad || blockSize <= 0 ||
            blockSize > 65536 || chCode > 10 || baseBps < 4 ||
            baseBps > 24 || br.dead) { done = true }
        else {
          val chans = Array.ofDim[Int](channels, blockSize)
          var ch = 0
          var bad = false
          while (ch < channels && !bad) {
            // side channels carry one extra bit
            val eb = baseBps + (chCode match {
              case 8 => if (ch == 1) 1 else 0  // left/side
              case 9 => if (ch == 0) 1 else 0  // right/side (side first)
              case 10 => if (ch == 1) 1 else 0 // mid/side
              case _ => 0
            })
            if (!subframe(br, chans(ch), blockSize, eb)) bad = true
            ch += 1
          }
          if (bad || br.dead) done = true
          else {
            br.alignByte()
            br.bits(16) // frame CRC-16, unverified
            if (br.dead) done = true
            else {
              // stereo decorrelation, then pooled accumulation
              chCode match {
                case 8 => // left/side -> right = left - side
                  var i = 0
                  while (i < blockSize) {
                    chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
                case 9 => // side/right -> left = right + side
                  var i = 0
                  while (i < blockSize) {
                    chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
                case 10 => // mid/side
                  var i = 0
                  while (i < blockSize) {
                    val side = chans(1)(i)
                    val mid2 = (chans(0)(i) << 1) | (side & 1)
                    chans(0)(i) = (mid2 + side) >> 1
                    chans(1)(i) = (mid2 - side) >> 1
                    i += 1
                  }
                case _ => ()
              }
              var c = 0
              while (c < channels) {
                var i = 0
                while (i < blockSize) {
                  val s = chans(c)(i)
                  val a = math.abs(s)
                  if (a > peak) peak = a
                  sumAbs += a
                  sumSq += s.toLong * s
                  n += 1
                  i += 1
                }
                c += 1
              }
            }
          }
        }
      }
    }
    if (n == 0) null
    else InternalRow(n, peak, sumAbs, sumSq)
  }

  /** Decode one subframe into `out`; false on any corruption. */
  private def subframe(br: BR, out: Array[Int], bs: Int, eb: Int): Boolean = {
    if (br.bits(1) != 0) return false // pad bit
    val typ = br.bits(6).toInt
    var wasted = 0
    if (br.bits(1) == 1L) {
      val q = br.unary()
      if (q < 0) return false
      wasted = q + 1
    }
    val sb = eb - wasted
    if (sb < 1 || sb > 33 || br.dead) return false
    val ok = typ match {
      case 0 => // CONSTANT
        val v = br.signedBits(sb)
        if (br.dead) false
        else { java.util.Arrays.fill(out, v); true }
      case 1 => // VERBATIM
        var i = 0
        while (i < bs && !br.dead) { out(i) = br.signedBits(sb); i += 1 }
        !br.dead
      case t if t >= 8 && t <= 12 => // FIXED, order 0..4
        val order = t - 8
        if (order > bs) false
        else {
          var i = 0
          while (i < order && !br.dead) { out(i) = br.signedBits(sb); i += 1 }
          if (br.dead || !residual(br, out, bs, order)) false
          else {
            var k = order
            while (k < bs) {
              val p = order match {
                case 0 => 0L
                case 1 => out(k - 1).toLong
                case 2 => 2L * out(k - 1) - out(k - 2)
                case 3 => 3L * out(k - 1) - 3L * out(k - 2) + out(k - 3)
                case 4 => 4L * out(k - 1) - 6L * out(k - 2) +
                  4L * out(k - 3) - out(k - 4)
              }
              out(k) = (out(k) + p).toInt
              k += 1
            }
            true
          }
        }
      case t if t >= 32 => // LPC, order 1..32
        val order = t - 31
        if (order > bs) false
        else {
          var i = 0
          while (i < order && !br.dead) { out(i) = br.signedBits(sb); i += 1 }
          val precRaw = br.bits(4).toInt
          if (br.dead || precRaw == 15) return false
          val prec = precRaw + 1
          val shift = br.signedBits(5)
          if (shift < 0) return false // negative shifts are forbidden
          val coef = new Array[Int](order)
          i = 0
          while (i < order && !br.dead) { coef(i) = br.signedBits(prec); i += 1 }
          if (br.dead || !residual(br, out, bs, order)) false
          else {
            var k = order
            while (k < bs) {
              var acc = 0L
              var j = 0
              while (j < order) { acc += coef(j).toLong * out(k - 1 - j); j += 1 }
              out(k) = (out(k) + (acc >> shift)).toInt
              k += 1
            }
            true
          }
        }
      case _ => false
    }
    if (!ok) return false
    if (wasted > 0) {
      var i = 0
      while (i < bs) { out(i) = out(i) << wasted; i += 1 }
    }
    true
  }

  /** Rice/Rice2 residual: fills out(order until bs); false on corruption. */
  private def residual(br: BR, out: Array[Int], bs: Int, order: Int): Boolean = {
    val method = br.bits(2).toInt
    if (method > 1 || br.dead) return false
    val pbits = if (method == 0) 4 else 5
    val escape = (1 << pbits) - 1
    val pOrder = br.bits(4).toInt
    val parts = 1 << pOrder
    if (br.dead || bs % parts != 0 || (bs >> pOrder) <= 0) return false
    val perPart = bs / parts
    if (perPart < order && parts == 1) return false
    var p = 0
    var idx = order
    while (p < parts) {
      val cnt = if (p == 0) perPart - order else perPart
      if (cnt < 0) return false
      val param = br.bits(pbits).toInt
      if (br.dead) return false
      if (param == escape) {
        val raw = br.bits(5).toInt
        if (br.dead) return false
        var i = 0
        while (i < cnt) {
          out(idx) = if (raw == 0) 0 else br.signedBits(raw)
          idx += 1; i += 1
        }
        if (br.dead) return false
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.unary()
          if (q < 0) return false
          val rem = if (param == 0) 0L else br.bits(param)
          if (br.dead) return false
          val u = (q.toLong << param) | rem
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
    true
  }
}
