package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL FLAC metadata from the STREAMINFO block (the mandatory first
  * metadata block after the `fLaC` marker): channels, sample rate, bits
  * per sample, total samples — same contract as [[WavMeta]]: pure byte
  * parsing, no codec, corrupt/truncated/non-FLAC payloads yield NULL,
  * never throw. */
final case class FlacMeta(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = FlacMeta.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_meta"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_flac_meta requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    FlacMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): FlacMeta =
    copy(child = newChild)
}

object FlacMeta {
  val outType: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("total_samples", LongType)))

  private def u8(b: Array[Byte], i: Int): Long = (b(i) & 0xFF).toLong

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    // "fLaC" marker, then metadata blocks: 1-byte header (bit7 = last,
    // bits 0-6 = type; 0 = STREAMINFO), 3-byte big-endian length
    if (b == null || b.length < 8 ||
        b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    var i = 4L
    while (i + 4 <= b.length) {
      val ii = i.toInt
      val header = b(ii) & 0xFF
      val blockType = header & 0x7F
      val len = (u8(b, ii + 1) << 16) | (u8(b, ii + 2) << 8) | u8(b, ii + 3)
      if (blockType == 0) {
        // STREAMINFO: the packed 64 bits at offsets 10..17 of the block
        // body hold rate(20) | channels-1(3) | bps-1(5) | totalSamples(36)
        if (len < 34 || i + 4 + 18 > b.length) return null
        val base = ii + 4
        var packed = 0L
        var k = 0
        while (k < 8) { packed = (packed << 8) | u8(b, base + 10 + k); k += 1 }
        val rate = (packed >>> 44).toInt
        val channels = ((packed >>> 41) & 0x7).toInt + 1
        val bits = ((packed >>> 36) & 0x1F).toInt + 1
        val total = packed & 0xFFFFFFFFFL
        if (rate <= 0) return null // 0 is invalid per spec
        return InternalRow(channels, rate, bits, total)
      }
      if ((header & 0x80) != 0) return null // last block, no STREAMINFO seen
      i += 4L + len
    }
    null
  }
}

/** REAL MP3 frame-header metadata: MPEG version, bitrate, sample rate,
  * and channel count from the first Layer-III frame sync (an ID3v2 tag
  * prefix is skipped via its syncsafe size). Same contract as
  * [[WavMeta]]: pure byte parsing, corrupt/non-MP3 payloads yield NULL,
  * never throw. */
final case class Mp3Meta(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = Mp3Meta.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp3_meta"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mp3_meta requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Mp3Meta.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
    copy(child = newChild)
}

object Mp3Meta {
  val outType: StructType = StructType(Seq(
    StructField("mpeg_version", IntegerType), // 1, 2, or 25 (MPEG-2.5)
    StructField("bitrate_kbps", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  // Layer III bitrate tables (kbps), index 1..14; 0 = free, 15 = bad
  private val bitrateV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val bitrateV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val rateV1 = Array(44100, 48000, 32000)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  private[graft] def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    var off = 0
    // ID3v2 tag: "ID3", 2 version bytes, 1 flag byte, 4 syncsafe size bytes
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(b, 6) & 0x7F) << 21) | ((u8(b, 7) & 0x7F) << 14) |
        ((u8(b, 8) & 0x7F) << 7) | (u8(b, 9) & 0x7F)
      val skipped = 10L + size
      if (skipped + 4 > b.length) return null
      off = skipped.toInt
    }
    if (off + 4 > b.length) return null
    // frame sync: 11 set bits
    if (u8(b, off) != 0xFF || (u8(b, off + 1) & 0xE0) != 0xE0) return null
    val versionBits = (u8(b, off + 1) >> 3) & 0x3 // 0=2.5, 2=MPEG2, 3=MPEG1
    val layerBits = (u8(b, off + 1) >> 1) & 0x3   // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return null
    val bitrateIdx = (u8(b, off + 2) >> 4) & 0xF
    val rateIdx = (u8(b, off + 2) >> 2) & 0x3
    if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return null
    val mode = (u8(b, off + 3) >> 6) & 0x3        // 3 = mono
    val (version, kbps, rate) = versionBits match {
      case 3 => (1, bitrateV1(bitrateIdx), rateV1(rateIdx))
      case 2 => (2, bitrateV2(bitrateIdx), rateV1(rateIdx) / 2)
      case _ => (25, bitrateV2(bitrateIdx), rateV1(rateIdx) / 4)
    }
    InternalRow(version, kbps, rate, if (mode == 3) 1 else 2)
  }
}
