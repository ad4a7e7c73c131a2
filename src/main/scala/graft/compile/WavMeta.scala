package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL audio-header parsing: RIFF/WAVE metadata (channels, sample rate,
  * bit depth, data-chunk byte count) from the container header alone —
  * the audio twin of [[ImageDims]]. Pure byte parsing, no codec; corrupt
  * / truncated / non-WAV payloads yield NULL, never throw. The
  * data-chunk size is read from its header field even when the payload
  * bytes are truncated (metadata extraction, not decoding). */
final case class WavMeta(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = WavMeta.outType
  // NULL for corrupt/non-WAV payloads regardless of input nullability
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_meta"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_wav_meta requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WavMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}

object WavMeta {
  val outType: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("data_bytes", LongType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s(0) && b(i + 1) == s(1) && b(i + 2) == s(2) && b(i + 3) == s(3)

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return null
    // Long scan index: a crafted ~2^31 chunk size must walk PAST the
    // payload (loop exits), never wrap an Int negative and read b(-x)
    var i = 12L
    var channels = -1; var rate = -1L; var bits = -1
    var dataBytes: java.lang.Long = null
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val size = le32(b, ii + 4)
      // fmt fields live in the chunk's own 16+ bytes — a shorter declared
      // size means the bytes belong to the next chunk: reject, don't read
      if (tag(b, ii, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        channels = le16(b, ii + 10)
        rate = le32(b, ii + 12)
        bits = le16(b, ii + 22)
      } else if (tag(b, ii, "data")) {
        dataBytes = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i += 8L + size + (size & 1L)
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0) null
    else InternalRow(channels, rate.toInt, bits, dataBytes)
  }
}

/** REAL PCM audio decode: integer sample statistics over a RIFF/WAVE
  * payload's data chunk — n_samples, peak |amplitude|, Σ|s|, Σs² — the
  * silence/clipping/energy screens a multimodal curation pipeline runs
  * before paying for feature extraction. Unlike the honestly-stubbed
  * compressed-codec paths ([[graft.ops.Multimodal]] fakeDecode*), PCM
  * needs no codec: this DECODES the actual frames (8-bit unsigned
  * centered at 128, 16-bit signed little-endian; interleaved channels
  * pooled), bit-exact and restatable by an integer SQL oracle.
  * Non-WAV / non-PCM (format tag ≠ 1) / other bit depths → NULL.
  * A declared data size past the payload decodes the whole samples
  * actually present (metadata lies; bytes don't). */
final case class PcmStats(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = PcmStats.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pcm_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pcm_stats requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PcmStats.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): PcmStats =
    copy(child = newChild)
}

object PcmStats {
  val outType: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("peak", IntegerType),
    StructField("sum_abs", LongType),
    StructField("sum_sq", LongType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s(0) && b(i + 1) == s(1) && b(i + 2) == s(2) && b(i + 3) == s(3)

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return null
    var i = 12L
    var fmtTag = -1; var bits = -1
    var dataAt = -1; var dataLen = 0L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val size = le32(b, ii + 4)
      if (tag(b, ii, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        fmtTag = le16(b, ii + 8)
        bits = le16(b, ii + 22)
      } else if (tag(b, ii, "data") && dataAt < 0) {
        dataAt = ii + 8
        dataLen = math.min(size, b.length.toLong - dataAt)
      }
      i += 8L + size + (size & 1L)
    }
    if (fmtTag != 1 || dataAt < 0 || (bits != 8 && bits != 16)) return null
    val width = bits / 8
    val n = dataLen / width // whole samples actually present
    var k = 0L
    var peak = 0; var sumAbs = 0L; var sumSq = 0L
    while (k < n) {
      val off = dataAt + (k * width).toInt
      val s = if (bits == 8) u8(b, off) - 128
              else (le16(b, off) << 16) >> 16 // sign-extend
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a
      sumSq += s.toLong * s
      k += 1
    }
    InternalRow(n, peak, sumAbs, sumSq)
  }
}
