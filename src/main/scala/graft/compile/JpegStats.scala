package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL baseline JPEG pixel decode over an opaque binary payload: the
  * complete ITU-T T.81 baseline-sequential path — marker segment walk,
  * canonical Huffman table reconstruction (DHT), entropy decode with
  * 0xFF00 byte-unstuffing and RSTn restart handling, DC prediction +
  * EXTEND, run/size AC decode (ZRL/EOB), dequantization (DQT), inverse
  * zigzag, exact double-precision 2-D IDCT, +128 level shift, clamp,
  * and JFIF YCbCr→RGB with replicated-chroma upsampling for subsampled
  * scans — feeding the same exact integer channel stats as
  * [[RgbStats]]/[[PngStats]]/[[GifStats]]: (width, height, n_px, Σr,
  * Σg, Σb). No codec library: Huffman + IDCT is plain arithmetic on
  * the stock JVM. This closes the LAST image-decode stub; of the
  * brief's multimodal mandate only MP3's synthesis filterbank remains
  * honestly stubbed.
  *
  * Determinism contract (what the oracle re-states): the IDCT is the
  * direct T.81 A.3.3 double sum evaluated in (u, v) row-major order
  * with the C(u)C(v) products pretabulated and C(0)² pinned to its
  * exact value 0.5 (see [[JpegStats.CC]]),
  * pixels are floor(x + 0.5) rounded then clamped to [0, 255], and
  * RGB conversion is the JFIF floor(x + 0.5) of the 1.402/0.344136/
  * 0.714136/1.772 form — all IEEE-double exact, so an independent
  * implementation of the same formulas reproduces every pixel bit-for-
  * bit (OpsSpec does, against an in-test encoder; the SQL oracle does
  * for DC-only scans where the math collapses to a closed form).
  *
  * Scope (documented, everything else → NULL, never throws): baseline
  * DCT (SOF0), 8-bit precision, 1 or 3 components, sampling factors
  * 1-2, single interleaved scan. Progressive (SOF2), extended (SOF1),
  * arithmetic coding, 12-bit, DNL, and hierarchical modes → NULL.
  * Truncated or corrupt entropy data yields the decoded-prefix stats
  * (whole MCU rows decoded so far — the [[RgbStats]] truncation
  * contract); n_px counts only pixels inside the declared w×h (MCU
  * padding pixels are discarded, never summed).
  *
  * Reference scope note: jsen (the reference) has no media path at all
  * (it validates JSON values, jsen/lib/jsen.js); this operator belongs
  * to the builder brief's multimodal mandate. */
final case class JpegStats(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = RgbStats.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegStats.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): JpegStats =
    copy(child = newChild)
}

object JpegStats {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** T.81 figure A.6 zigzag: zz index → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) lookup, exact doubles shared by every block. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  /** C(u)·C(v) product table with CC(0,0) pinned to its EXACT value 0.5
    * (the double product of 1/√2 with itself lands one ulp below 0.5,
    * which would shift a DC-only block whose F/8 + 0.5 is exactly
    * integral off the rounding boundary — with the exact constant the
    * DC path is pure powers-of-two arithmetic, bit-reproducible by any
    * engine's floor(F/8 + 0.5), which is what the SQL oracle states). */
  private val CC: Array[Array[Double]] = Array.tabulate(8, 8)((u, v) =>
    if (u == 0 && v == 0) 0.5 else C(u) * C(v))

  /** Canonical Huffman table: lookup by (length, code) via first-code /
    * value-offset arrays — the standard T.81 DECODE procedure. */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = {
      if (len < 1 || len > 16 || maxCode(len) < 0 ||
          code < minCode(len) || code > maxCode(len)) -1
      else vals(valPtr(len) + code - minCode(len)) & 0xFF
    }
  }

  /** MSB-first bit reader over the entropy segment with FF00
    * unstuffing; RSTn markers are consumed by `syncRestart`. Returns
    * -1 on exhaustion or on hitting a non-RST marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var hitMarker = false // stopped at a non-RST marker (e.g. EOI)

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) return -1
        var byte0 = u8(b, pos); pos += 1
        if (byte0 == 0xFF) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val m = u8(b, pos)
          if (m == 0x00) pos += 1 // stuffed FF
          else { hitMarker = true; pos -= 1; return -1 }
        }
        cur = byte0; nbits = 8
      }
      nbits -= 1
      (cur >>> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val x = bit(); if (x < 0) return -1
        v = (v << 1) | x; i += 1
      }
      v
    }

    /** At a restart boundary: discard padding bits, skip a stuffed
      * FF00 that 1-bit padding can produce, expect FFD0+i. */
    def syncRestart(): Boolean = {
      nbits = 0; hitMarker = false
      while (pos + 2 <= b.length && u8(b, pos) == 0xFF &&
             u8(b, pos + 1) == 0x00) pos += 2
      if (pos + 2 > b.length) return false
      if (u8(b, pos) != 0xFF) return false
      val m = u8(b, pos + 1)
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }

    def decodeHuff(h: Huff): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        val x = bit(); if (x < 0) return -1
        code = (code << 1) | x; len += 1
        if (h.maxCode(len) >= 0 && code <= h.maxCode(len)) {
          val v = h.value(len, code)
          if (v >= 0) return v
        }
      }
      -1
    }
  }

  /** T.81 F.12 EXTEND: map magnitude bits to the signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, hs: Int, vs: Int, tq: Int) {
    var dcTab: Huff = null
    var acTab: Huff = null
    var dcPred: Int = 0
  }

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    if (u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return null // SOI
    var off = 2
    val qt = Array.ofDim[Int](4, 64) // natural order after inverse zigzag
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var scanAt = -1

    // ---- marker segment walk up to SOS ----
    var done = false
    while (!done) {
      // markers start with FF (possibly several fill FFs)
      if (off >= b.length || u8(b, off) != 0xFF) return null
      while (off < b.length && u8(b, off) == 0xFF) off += 1
      if (off >= b.length) return null
      val marker = u8(b, off); off += 1
      marker match {
        case 0xD9 => return null // EOI before any scan
        case 0x01 => () // TEM, standalone
        case m if m >= 0xD0 && m <= 0xD7 => () // stray RST, standalone
        case 0xC0 => // SOF0 baseline
          if (off + 2 > b.length) return null
          val len = be16(b, off)
          if (off + len > b.length || len < 8) return null
          val prec = u8(b, off + 2)
          h = be16(b, off + 3); w = be16(b, off + 5)
          val nc = u8(b, off + 7)
          if (prec != 8 || w <= 0 || h <= 0 || (nc != 1 && nc != 3) ||
              len < 8 + 3 * nc) return null
          comps = new Array[Comp](nc)
          var i = 0
          while (i < nc) {
            val p = off + 8 + 3 * i
            val hv = u8(b, p + 1)
            val hs = hv >>> 4; val vs = hv & 0xF
            if (hs < 1 || hs > 2 || vs < 1 || vs > 2) return null
            comps(i) = Comp(u8(b, p), hs, vs, u8(b, p + 2) & 3)
            i += 1
          }
          off += len
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
             0xCB | 0xCD | 0xCE | 0xCF =>
          return null // non-baseline SOF: out of scope
        case 0xC4 => // DHT (possibly several tables in one segment)
          if (off + 2 > b.length) return null
          val len = be16(b, off)
          if (off + len > b.length || len < 2) return null
          var p = off + 2
          val segEnd = off + len
          while (p < segEnd) {
            if (p + 17 > segEnd) return null
            val tc = u8(b, p) >>> 4; val th = u8(b, p) & 0xF
            if (tc > 1 || th > 3) return null
            val bits = Array.tabulate(16)(i => u8(b, p + 1 + i))
            val total = bits.sum
            if (total > 256 || p + 17 + total > segEnd) return null
            val vals = new Array[Byte](total)
            System.arraycopy(b, p + 17, vals, 0, total)
            val huff = new Huff(bits, vals)
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
            p += 17 + total
          }
          off += len
        case 0xDB => // DQT
          if (off + 2 > b.length) return null
          val len = be16(b, off)
          if (off + len > b.length || len < 2) return null
          var p = off + 2
          val segEnd = off + len
          while (p < segEnd) {
            val pq = u8(b, p) >>> 4; val tq = u8(b, p) & 0xF
            if (tq > 3) return null
            if (pq == 0) {
              if (p + 1 + 64 > segEnd) return null
              var i = 0
              while (i < 64) { qt(tq)(Zigzag(i)) = u8(b, p + 1 + i); i += 1 }
              p += 65
            } else if (pq == 1) {
              if (p + 1 + 128 > segEnd) return null
              var i = 0
              while (i < 64) { qt(tq)(Zigzag(i)) = be16(b, p + 1 + 2 * i); i += 1 }
              p += 129
            } else return null
            qtSeen(tq) = true
          }
          off += len
        case 0xDD => // DRI
          if (off + 4 > b.length) return null
          val len = be16(b, off)
          if (len != 4 || off + len > b.length) return null
          restartInterval = be16(b, off + 2)
          off += len
        case 0xDA => // SOS
          if (comps == null) return null
          if (off + 2 > b.length) return null
          val len = be16(b, off)
          if (off + len > b.length || len < 3) return null
          val ns = u8(b, off + 2)
          if (ns != comps.length || len < 6 + 2 * ns) return null
          var i = 0
          while (i < ns) {
            val p = off + 3 + 2 * i
            val cs = u8(b, p)
            val tt = u8(b, p + 1)
            val comp = comps.find(_.id == cs).orNull
            if (comp == null) return null
            comp.dcTab = dcTabs((tt >>> 4) & 3)
            comp.acTab = acTabs(tt & 3)
            if (comp.dcTab == null || comp.acTab == null) return null
            i += 1
          }
          scanAt = off + len
          done = true
        case _ => // APPn, COM, anything else with a length: skip
          if (off + 2 > b.length) return null
          val len = be16(b, off)
          if (len < 2 || off + len > b.length) return null
          off += len
      }
    }
    var qi = 0
    while (qi < comps.length) {
      if (!qtSeen(comps(qi).tq)) return null
      qi += 1
    }

    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    if (w.toLong * h.toLong > (1L << 31)) return null // forged-dims cap

    // decoded component planes for ONE MCU row (replicated upsampling
    // happens at accumulation time) — O(width × mcuH) memory
    val planeW = mcusX * mcuW
    val planes = comps.map(c =>
      new Array[Short](planeW / (hMax / c.hs) * (mcuH / (vMax / c.vs))))
    // per-component plane row length
    val planeRowLen = comps.map(c => planeW / (hMax / c.hs))

    val reader = new BitReader(b, scanAt)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var n = 0L

    // decode one 8x8 block of component c into pix (level-shifted,
    // clamped); false = entropy stream ended (truncation/corruption)
    def block(c: Comp): Boolean = {
      java.util.Arrays.fill(coef, 0)
      val t = reader.decodeHuff(c.dcTab)
      if (t < 0 || t > 15) return false
      val diffBits = if (t == 0) 0 else reader.bits(t)
      if (diffBits < 0) return false
      c.dcPred += extend(diffBits, t)
      coef(0) = c.dcPred * qt(c.tq)(0)
      var k = 1
      var open = true
      while (open && k < 64) {
        val rs = reader.decodeHuff(c.acTab)
        if (rs < 0) return false
        val r = rs >>> 4; val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else open = false    // EOB
        } else {
          k += r
          if (k > 63) return false
          val mag = reader.bits(s)
          if (mag < 0) return false
          coef(Zigzag(k)) = extend(mag, s) * qt(c.tq)(Zigzag(k))
          k += 1
        }
      }
      // exact direct IDCT (T.81 A.3.3), (u, v) row-major accumulation
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              val f = coef(u * 8 + v)
              if (f != 0) acc += CC(u)(v) * f * Cos(y)(u) * Cos(x)(v)
              v += 1
            }
            u += 1
          }
          val s = math.floor(acc / 4.0 + 0.5).toInt + 128
          pix(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
          x += 1
        }
        y += 1
      }
      true
    }

    def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    // accumulate one finished MCU row into the channel sums
    def accumulateRow(my: Int): Unit = {
      val y0 = my * mcuH
      val rows = math.min(mcuH, h - y0)
      var dy = 0
      while (dy < rows) {
        var x = 0
        while (x < w) {
          if (comps.length == 1) {
            val c0 = comps(0)
            val sx = x / (hMax / c0.hs); val sy = dy / (vMax / c0.vs)
            val g = planes(0)(sy * planeRowLen(0) + sx)
            sumR += g; sumG += g; sumB += g
          } else {
            val yy = {
              val c0 = comps(0)
              planes(0)((dy / (vMax / c0.vs)) * planeRowLen(0) +
                x / (hMax / c0.hs)).toInt
            }
            val cb = {
              val c1 = comps(1)
              planes(1)((dy / (vMax / c1.vs)) * planeRowLen(1) +
                x / (hMax / c1.hs)).toInt
            }
            val cr = {
              val c2 = comps(2)
              planes(2)((dy / (vMax / c2.vs)) * planeRowLen(2) +
                x / (hMax / c2.hs)).toInt
            }
            sumR += clamp255(math.floor(yy + 1.402 * (cr - 128) + 0.5).toInt)
            sumG += clamp255(math.floor(
              yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt)
            sumB += clamp255(math.floor(yy + 1.772 * (cb - 128) + 0.5).toInt)
          }
          n += 1
          x += 1
        }
        dy += 1
      }
    }

    // ---- MCU loop, restart-aware, whole-MCU-row truncation grain ----
    var my = 0
    var mcuCount = 0
    var dead = false
    while (my < mcusY && !dead) {
      var mx = 0
      while (mx < mcusX && !dead) {
        if (restartInterval > 0 && mcuCount == restartInterval) {
          if (!reader.syncRestart()) { dead = true }
          else { comps.foreach(_.dcPred = 0); mcuCount = 0 }
        }
        if (!dead) {
          var ci = 0
          while (ci < comps.length && !dead) {
            val c = comps(ci)
            var by = 0
            while (by < c.vs && !dead) {
              var bx = 0
              while (bx < c.hs && !dead) {
                if (!block(c)) dead = true
                else {
                  // place the block into the component's MCU-row plane
                  val rl = planeRowLen(ci)
                  val px0 = (mx * c.hs + bx) * 8
                  val py0 = by * 8
                  var yy = 0
                  while (yy < 8) {
                    var xx = 0
                    while (xx < 8) {
                      val px = px0 + xx
                      if (px < rl)
                        planes(ci)((py0 + yy) * rl + px) =
                          pix(yy * 8 + xx).toShort
                      xx += 1
                    }
                    yy += 1
                  }
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          if (!dead) mcuCount += 1
        }
        if (!dead) mx += 1
      }
      if (!dead) { accumulateRow(my); my += 1 }
    }
    if (n == 0) null
    else InternalRow(w, h, n, sumR, sumG, sumB)
  }
}
