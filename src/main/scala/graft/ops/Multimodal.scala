package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, partition-friendly batch shapes,
  * and decode/feature hooks.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested, and so is container-header METADATA extraction
  * ([[imageDims]]: PNG/JPEG/GIF format + dimensions, pure byte parsing).
  * PIXEL/SAMPLE decode is REAL for every image format and for PCM
  * audio — all pure stock-JVM arithmetic, no codec library: BMP
  * ([[rgbStats]]), PNG incl. inflate + unfilter ([[pngStats]]), GIF
  * incl. full variable-width LZW ([[gifStats]]), baseline JPEG incl.
  * Huffman entropy decode + IDCT ([[jpegStats]]), and WAV PCM
  * ([[pcmStats]]). Only MP3 AUDIO FRAME decode (a full polyphase
  * synthesis filterbank) stays STUBBED with a deterministic fake; its
  * header metadata is real ([[mp3Meta]]). A production deployment
  * swaps `fakeDecode*` for a Pandas-UDF / mapInArrow stage with the
  * same input/output schema — nothing else changes.
  */
object Multimodal {

  /** Canonical media-row schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),      // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType),
      StructField("mime", StringType))))))

  /** Wrap an arbitrary (id, string) DF as opaque media rows — UTF-8 bytes
    * stand in for real payloads in-sandbox. */
  def asMedia(df: DataFrame, idCol: String, textCol: String,
              modality: String = "image"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      payload.as("payload"),
      struct(
        octet_length(col(textCol)).as("n_bytes"),
        lit(s"application/x-fake-$modality").as("mime")).as("meta"))
  }

  /** REAL image metadata: format + dimensions parsed from PNG/JPEG/GIF
    * container headers by the [[graft.compile.ImageDims]] expression —
    * pure byte parsing, no codec. NULL for unrecognized/corrupt payloads
    * (never throws — corrupt media must not kill a scan). */
  def imageDims(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.ImageDims(
      ColumnBridge.expression(payload)))
  }

  /** REAL image pixel decode: integer channel stats (width, height,
    * n_px, Σr, Σg, Σb) over an uncompressed 24-bit BMP via
    * [[graft.compile.RgbStats]] — brightness/solid-color screens with
    * no codec, the image twin of [[pcmStats]]. NULL for non-BMP /
    * compressed / other depths. Narrow, scan speed. */
  def rgbStats(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.RgbStats(
      ColumnBridge.expression(payload)))
  }

  /** REAL PNG pixel decode: same integer channel stats as [[rgbStats]]
    * (width, height, n_px, Σr, Σg, Σb) over a PNG payload via
    * [[graft.compile.PngStats]] — IDAT inflate with stock
    * `java.util.zip.Inflater` plus RFC 2083 per-row unfilter
    * (None/Sub/Up/Average/Paeth), streaming two row buffers so memory
    * is O(row). Depth-8, color types 0/2/4/6, non-interlaced; anything
    * else (and non-PNG) → NULL; truncated/corrupt IDAT → decoded-prefix
    * stats, never a throw. Composable with [[rgbMeanBrightness]]. */
  def pngStats(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.PngStats(
      ColumnBridge.expression(payload)))
  }

  /** REAL GIF pixel decode: same integer channel stats as [[rgbStats]]
    * (width, height, n_px, Σr, Σg, Σb) over a GIF payload via
    * [[graft.compile.GifStats]] — full variable-width GIF-LZW
    * decompression (3..12-bit codes LSB-first, clear/end, KwKwK,
    * deferred clear) of the first frame, indices mapped through the
    * active color table (local overrides global). First frame only,
    * transparency ignored, interlace accepted (sums are order-free);
    * non-GIF / no color table → NULL; truncated or corrupt code
    * streams → decoded-prefix stats, never a throw. Composable with
    * [[rgbMeanBrightness]]. */
  def gifStats(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.GifStats(
      ColumnBridge.expression(payload)))
  }

  /** REAL baseline JPEG pixel decode: same integer channel stats as
    * [[rgbStats]] (width, height, n_px, Σr, Σg, Σb) over a JPEG payload
    * via [[graft.compile.JpegStats]] — the complete T.81
    * baseline-sequential path: canonical Huffman entropy decode (with
    * byte-unstuffing and restart markers), dequantization, exact
    * double-precision IDCT, and JFIF YCbCr→RGB with replicated-chroma
    * upsampling. Grayscale fills r=g=b. Progressive/12-bit/arithmetic →
    * NULL; truncated or corrupt entropy data → decoded-prefix stats
    * (whole MCU rows), never a throw. Composable with
    * [[rgbMeanBrightness]]. */
  def jpegStats(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.JpegStats(
      ColumnBridge.expression(payload)))
  }

  /** Mean channel brightness from a [[rgbStats]] struct, rounded to 6
    * ((Σr+Σg+Σb)/(3·n) — exact integer sums, one divide). */
  def rgbMeanBrightness(stats: Column): Column =
    when(stats.getField("n_px") > 0,
      Rounding.roundAt(
        (stats.getField("sum_r") + stats.getField("sum_g") +
          stats.getField("sum_b")).cast("double") /
          (stats.getField("n_px") * 3).cast("double"), 6))

  /** REAL audio metadata: RIFF/WAVE channels, sample rate, bit depth, and
    * data-chunk byte count via [[graft.compile.WavMeta]] — same
    * no-codec byte parsing as [[imageDims]]; NULL for non-WAV payloads. */
  def wavMeta(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.WavMeta(
      ColumnBridge.expression(payload)))
  }

  /** REAL PCM audio DECODE: integer sample stats (n_samples, peak |s|,
    * Σ|s|, Σs²) over a WAV payload's data frames via
    * [[graft.compile.PcmStats]] — the silence/clipping/energy screens of
    * a multimodal curation pass. PCM needs no codec, so unlike the
    * fakeDecode* stubs this decodes the REAL frames (8-bit unsigned /
    * 16-bit signed LE, channels pooled). NULL for non-WAV / non-PCM /
    * other depths. Narrow — scan speed on a 100-TB media table. */
  def pcmStats(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.PcmStats(
      ColumnBridge.expression(payload)))
  }

  /** RMS amplitude from a [[pcmStats]] struct, rounded to 6 (one sqrt +
    * one divide over the exact integer sums — engine-reproducible). */
  def pcmRms(stats: Column): Column =
    when(stats.getField("n_samples") > 0,
      Rounding.roundAt(sqrt(stats.getField("sum_sq").cast("double") /
        stats.getField("n_samples")), 6))

  /** REAL FLAC audio frame DECODE: same integer sample stats as
    * [[pcmStats]] (n_samples, peak, Σ|s|, Σs²; channels pooled) over a
    * FLAC payload via [[graft.compile.FlacPcm]] — the complete lossless
    * path: CONSTANT/VERBATIM/FIXED/LPC subframes, Rice + Rice2 residual
    * partitions with raw escapes, wasted bits, and left/right/mid-side
    * stereo decorrelation. Pure arithmetic, no codec tables (the reason
    * MP3 frames stay stubbed and FLAC doesn't). Truncated/corrupt →
    * whole-frame decoded-prefix stats; non-FLAC → NULL. */
  def flacPcm(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.FlacPcm(
      ColumnBridge.expression(payload)))
  }

  /** REAL FLAC STREAMINFO metadata — (channels, sample_rate, bits,
    * total_samples); same no-codec contract as [[wavMeta]]. */
  def flacMeta(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.FlacMeta(
      ColumnBridge.expression(payload)))
  }

  /** REAL MP3 frame-header metadata — (mpeg_version, bitrate_kbps,
    * sample_rate, channels), ID3v2 prefixes skipped; same no-codec
    * contract as [[wavMeta]]. */
  def mp3Meta(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.Mp3Meta(
      ColumnBridge.expression(payload)))
  }

  /** REAL animation frame-sample: decode the `frame`-th (0-based) image
    * frame of an animated GIF into the same exact channel stats as
    * [[gifStats]] — earlier frames skip by container block walking (no
    * LZW decode paid for unsampled frames). Frame absent/truncated →
    * NULL. */
  def gifFrameStats(payload: Column, frame: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.GifStats(
      ColumnBridge.expression(payload), frame))
  }

  /** REAL animation frame COUNT (complete frames present in the
    * container; truncation counts the prefix; non-GIF → NULL). */
  def gifFrameCount(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.GifFrameCount(
      ColumnBridge.expression(payload)))
  }

  /** REAL image RESIZE: nearest-neighbor to `dw`×`dh`, returned as
    * dw·dh·3 bytes of top-down row-major RGB, over EITHER supported
    * pixel source — 24-bit uncompressed BMP ([[graft.compile.BmpResize]],
    * O(dw·dh) sampled fetches) or depth-8 PNG ([[graft.compile.PngResize]],
    * streaming inflate+unfilter that STOPS after the last sampled row).
    * Format dispatch is a coalesce over the magic-gated kernels (each
    * nulls on the other's magic before any work). A payload missing any
    * sampled pixel → NULL (a partial resize is a different image, not a
    * prefix); other formats → NULL. */
  def rgbResize(payload: Column, dw: Int, dh: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    coalesce(
      ColumnBridge.column(graft.compile.BmpResize(
        ColumnBridge.expression(payload), dw, dh)),
      ColumnBridge.column(graft.compile.PngResize(
        ColumnBridge.expression(payload), dw, dh)))
  }

  /** STUB image decode: deterministic fake dimensions derived from payload
    * length and first bytes. Real impl: a mapInArrow batch decoder with
    * this exact output schema. */
  def fakeDecodeImage(payload: Column): Column = struct(
    (octet_length(payload) % 1920 + 1).as("width"),
    (octet_length(payload) % 1080 + 1).as("height"),
    lit(3).as("channels"))

  /** STUB feature extraction: fixed-size float vector from payload bytes —
    * byte-windowed means, the batch shape a real encoder would produce. */
  def fakeFeatures(payload: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (crc32(concat(payload, i.cast("string").cast("binary"))) % 1000L)
        .cast("double") / 1000.0)

  /** Frame sampling plumbing for video-like payloads: split the payload
    * into `frames` equal byte windows, one output row per sampled frame.
    * The explode is the real thing; the "frame" is a byte slice. */
  def sampleFrames(df: DataFrame, frames: Int): DataFrame = {
    val n = octet_length(col("payload"))
    val frameLen = greatest(n / frames, lit(1))
    df.select(col("media_id"), col("modality"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)),
          i => substr(col("payload"), i * frameLen + 1, frameLen)))
          .as(Seq("frame_idx", "frame_bytes")))
      .withColumn("frame_crc", crc32(col("frame_bytes")))
  }

  /** Decode + feature pipeline over media rows (stubbed kernels, real
    * plan shape: narrow projection, codegen-friendly, no shuffle). */
  def decodeAndFeaturize(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("modality"), col("meta"),
      fakeDecodeImage(col("payload")).as("decoded"),
      fakeFeatures(col("payload")).as("features"))
}
