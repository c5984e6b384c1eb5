package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal binary-column operators for the training-data pipeline:
  * format sniffing, header metadata extraction, and batched decode
  * plumbing over opaque image/audio/video payloads.
  *
  * Design: payloads are opaque BINARY columns with typed metadata extracted
  * by PURE CODEGEN expressions wherever the container format permits
  * (magic bytes + fixed-offset header fields: PNG/GIF/BMP/WAV), falling
  * back to a JVM batch function only for formats needing a scan (JPEG SOF
  * markers). At 100 TB the sniff/metadata pass is parquet-scan speed with
  * nothing but projected bytes moving, and decode runs batched per
  * partition with a bounded memory footprint. */
object Multimodal {

  // ------------------------------------------------------------- sniffing

  private def hexPrefix(bin: Column, len: Int): Column =
    hex(substring(bin, 1, len))

  /** Container format from magic bytes (the `file`-style sniff). */
  def sniffFormat(bin: Column): Column =
    when(hexPrefix(bin, 8) === "89504E470D0A1A0A", "png")
      .when(hexPrefix(bin, 3) === "FFD8FF", "jpeg")
      .when(hexPrefix(bin, 6).isin("474946383761", "474946383961"), "gif")
      .when(hexPrefix(bin, 2) === "424D", "bmp")
      .when(hexPrefix(bin, 4) === "52494646" &&
        hex(substring(bin, 9, 4)) === "57415645", "wav")
      .when(hexPrefix(bin, 4) === "25504446", "pdf")
      .when(hexPrefix(bin, 3) === "494433" || hexPrefix(bin, 2) === "FFFB", "mp3")
      .when(hexPrefix(bin, 4) === "504B0304", "zip")
      .when(substring(bin, 5, 8).cast("string").isin("ftypisom", "ftypmp42", "ftypMSNV"), "mp4")
      .otherwise("unknown")

  // ------------------------------------------------- header field helpers

  /** Big-endian unsigned int from `len` bytes at 1-based `offset`. */
  private def beUint(bin: Column, offset: Int, len: Int): Column =
    conv(hex(substring(bin, offset, len)), 16, 10).cast("long")

  /** Little-endian unsigned int from `len` bytes at 1-based `offset`
    * (byte-reversed big-endian read; codegen-only). */
  private def leUint(bin: Column, offset: Int, len: Int): Column = {
    val reversedHex = concat((0 until len).reverse.map(i =>
      hex(substring(bin, offset + i, 1))): _*)
    conv(reversedHex, 16, 10).cast("long")
  }

  /** PNG IHDR dimensions: width/height big-endian at bytes 17-20 / 21-24. */
  def pngWidth(bin: Column): Column = beUint(bin, 17, 4)
  def pngHeight(bin: Column): Column = beUint(bin, 21, 4)

  /** GIF logical-screen dimensions: little-endian uint16 at 7-8 / 9-10. */
  def gifWidth(bin: Column): Column = leUint(bin, 7, 2)
  def gifHeight(bin: Column): Column = leUint(bin, 9, 2)

  /** BMP (BITMAPINFOHEADER) dimensions: little-endian int32 at 19-22 / 23-26. */
  def bmpWidth(bin: Column): Column = leUint(bin, 19, 4)
  def bmpHeight(bin: Column): Column = leUint(bin, 23, 4)

  /** WAV (canonical RIFF) header fields. */
  def wavChannels(bin: Column): Column = leUint(bin, 23, 2)
  def wavSampleRate(bin: Column): Column = leUint(bin, 25, 4)
  def wavByteRate(bin: Column): Column = leUint(bin, 29, 4)
  def wavBitsPerSample(bin: Column): Column = leUint(bin, 35, 2)
  /** Duration in seconds assuming the canonical 44-byte header. */
  def wavDurationSec(bin: Column): Column =
    (length(bin) - lit(44)).cast("double") / wavByteRate(bin).cast("double")

  /** JPEG dimensions need an SOF-marker scan — not fixed-offset, so this is
    * the one JVM function on the path (batched, no state). */
  private val jpegDims = udf { (bytes: Array[Byte]) =>
    if (bytes == null || bytes.length < 4) null
    else {
      var i = 2
      var res: Option[(Int, Int)] = None
      while (i + 9 < bytes.length && res.isEmpty) {
        if ((bytes(i) & 0xFF) == 0xFF) {
          val marker = bytes(i + 1) & 0xFF
          val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
          // SOF0..SOF15 except DHT(C4)/DAC(CC)/RST
          if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            val h = ((bytes(i + 5) & 0xFF) << 8) | (bytes(i + 6) & 0xFF)
            val w = ((bytes(i + 7) & 0xFF) << 8) | (bytes(i + 8) & 0xFF)
            res = Some((w, h))
          } else i += 2 + len
        } else i += 1
      }
      res.map { case (w, h) => Array(w, h) }.orNull
    }
  }
  def jpegWidth(bin: Column): Column = jpegDims(bin).getItem(0).cast("long")
  def jpegHeight(bin: Column): Column = jpegDims(bin).getItem(1).cast("long")

  /** Unified metadata struct for a binary column: format, byte size, and
    * per-format dimensions/duration (nulls where not applicable). */
  def metadata(bin: Column): Column = {
    val fmt = sniffFormat(bin)
    struct(
      fmt.as("format"),
      length(bin).cast("long").as("n_bytes"),
      when(fmt === "png", pngWidth(bin))
        .when(fmt === "gif", gifWidth(bin))
        .when(fmt === "bmp", bmpWidth(bin))
        .when(fmt === "jpeg", jpegWidth(bin)).as("width"),
      when(fmt === "png", pngHeight(bin))
        .when(fmt === "gif", gifHeight(bin))
        .when(fmt === "bmp", bmpHeight(bin))
        .when(fmt === "jpeg", jpegHeight(bin)).as("height"),
      when(fmt === "wav", wavSampleRate(bin)).as("sample_rate"),
      when(fmt === "wav", wavDurationSec(bin)).as("duration_sec"))
  }

  // ------------------------------------------------------ decode plumbing

  /** Decoded-image row schema produced by `decodeImages`. */
  val decodedSchema = "struct<width: int, height: int, channels: int, pixels: array<float>>"

  /** Batched image decode over partitions (the mapInPandas-equivalent
    * plumbing: iterate a partition, emit fixed-schema feature rows with
    * bounded memory).
    *
    * PNG payloads are decoded FOR REAL by the pure-JVM codec
    * (graft.multimodal.PngCodec: IDAT inflate + all five scanline
    * un-filters, gray/rgb/rgba/palette) — the r02 fake plane is gone.
    * Non-PNG formats (no codec in this container) and unsupported PNG
    * variants decode to NULL, never to fabricated pixels. Pixels are
    * channel-interleaved floats in [0, 1] at NATIVE dimensions — resample
    * afterwards with `resizePixels` (the old targetW/targetH parameters
    * documented a resize this function never performed). */
  def decodeImages(df: DataFrame, binCol: String): DataFrame = {
    val dec = udf { (bytes: Array[Byte]) =>
      PngCodec.decode(bytes).map { d =>
        val px = new Array[Float](d.pixels.length)
        var i = 0
        while (i < px.length) { px(i) = (d.pixels(i) & 0xFF) / 255.0f; i += 1 }
        (d.width, d.height, d.channels, px)
      }.orNull
    }
    df.withColumn("decoded", dec(col(binCol)).cast(decodedSchema))
  }

  /** Stride-resample a decoded pixel plane to (w, h) — real array math on
    * the stubbed representation (nearest-neighbor). */
  def resizePixels(decoded: Column, srcW: Int, srcH: Int, dstW: Int, dstH: Int): Column =
    resizePixelsDyn(decoded, lit(srcW), lit(srcH), dstW, dstH)

  /** Per-row source dimensions (e.g. `decoded.width`/`decoded.height`) —
    * same nearest-neighbor stride arithmetic with Column dims. */
  def resizePixelsDyn(decoded: Column, srcW: Column, srcH: Column,
                      dstW: Int, dstH: Int): Column = {
    val idx = sequence(lit(0), lit(dstW * dstH - 1))
    transform(idx, i => {
      // integer stride arithmetic (Column `/` is double division)
      val y = floor(i / lit(dstW)).cast("int") * srcH / lit(dstH)
      val x = (i % dstW) * srcW / lit(dstW)
      element_at(decoded.getField("pixels"),
        (floor(y).cast("int") * srcW.cast("int") + floor(x).cast("int") + 1))
    })
  }

  /** Frame-level audio features over REAL decoded WAV PCM: one row per
    * non-overlapping `frameLen`-sample frame with RMS energy and
    * zero-crossing rate — the decode -> frame -> feature-extract pipeline
    * shape of the multimodal brief, end to end on actual samples.
    * Multi-channel audio is downmixed to mono (per-step channel mean)
    * before framing, so zero crossings are crossings of the mono signal,
    * never interleaving artifacts. Undecodable payloads emit no rows
    * (WavCodec's decoded-or-None contract; explode drops the null).
    * Adds columns `frame_idx`, `rms`, `zero_crossings`. */
  def audioFrameFeatures(df: DataFrame, binCol: String, frameLen: Int): DataFrame = {
    val feats = udf { (bytes: Array[Byte]) =>
      WavCodec.decode(bytes).map { d =>
        val ch = math.max(1, d.channels)
        val t = d.samples.length / ch
        val mono = new Array[Double](t)
        var k = 0
        while (k < t) {
          var s = 0.0; var c = 0
          while (c < ch) { s += d.samples(k * ch + c); c += 1 }
          mono(k) = s / ch
          k += 1
        }
        val n = t / frameLen
        Array.tabulate(n) { f =>
          val off = f * frameLen
          var sq = 0.0
          var zc = 0
          var i = 0
          while (i < frameLen) {
            val v = mono(off + i)
            sq += v * v
            if (i > 0 && (v >= 0) != (mono(off + i - 1) >= 0)) zc += 1
            i += 1
          }
          (f, math.sqrt(sq / frameLen), zc)
        }
      }.orNull
    }
    // unique intermediate names: never clobber caller columns
    val tmpFrames = "__graft_frames"
    val tmpFr = "__graft_fr"
    df.withColumn(tmpFrames, feats(col(binCol)))
      .select(df.columns.map(col) :+ explode(col(tmpFrames)).as(tmpFr): _*)
      .select(df.columns.map(col) :+ col(s"$tmpFr._1").as("frame_idx")
        :+ col(s"$tmpFr._2").as("rms") :+ col(s"$tmpFr._3").as("zero_crossings"): _*)
  }

  /** Frame sampling for (stub) video/audio payloads: every k-th fixed-size
    * frame of the raw payload as its own row — the partition-local explode
    * shape a real codec would also use. */
  def sampleFrames(df: DataFrame, binCol: String, frameBytes: Int, every: Int): DataFrame = {
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(
          (length(col(binCol)) / lit(frameBytes * every)).cast("int") - 1, lit(0)))))
      .withColumn("frame",
        expr(s"substring($binCol, frame_idx * ${frameBytes * every} + 1, $frameBytes)"))
  }
}

/** Subword-aware token counting (the "BPE-ish" tokenizer surface of the
  * pipeline brief): GPT-2-style pre-tokenization pattern — contractions,
  * letter runs, digit runs, punctuation runs — counted by a codegen regex.
  * Real BPE merges need a vocab file; pre-token count is the standard
  * upper-bound proxy (every BPE token boundary is a pre-token boundary). */
object Tokenize {
  /** The pre-tokenizer regex (kept DuckDB-compatible: no lookaheads). */
  val pattern: String = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"

  def preTokenCount(text: Column): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Crude BPE-token estimate: pre-tokens plus one extra per 8 characters
    * of long words (long words split into multiple subwords). Explicit
    * floor: Column `/` is double division, and a bare long cast would
    * diverge from SQL engines that round half-to-even on cast. */
  def subwordCountEstimate(text: Column): Column =
    preTokenCount(text) +
      aggregate(
        filter(split(text, "\\s+"), w => length(w) > lit(8)),
        lit(0L),
        (acc, w) => acc + floor(length(w) / lit(8)).cast("long"))
}
