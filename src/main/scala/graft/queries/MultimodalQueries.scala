package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Trajectories
import graft.lag.Lag
import graft.agg.Covariance
import graft.linalg.LinAlg
import graft.markov.TransitionCounting
import graft.text.{Bpe, Packing, Pii, Scoring, TextFunctions}
import graft.dedup.Dedup
import graft.operators.Joins
import graft.similarity.Similarity
import graft.queries.QShared._

/** MultimodalQueries: PNG/BMP/WAV/MP4 codecs, metadata sniff, resize, aHash, audio features.
  *
  * One slice of the driver-contract registry (VERDICT r06 item 8 split
  * of the 5,000-line SparkEntry monolith). Entry bodies are UNCHANGED;
  * graft.SparkEntry merges every family into the single `queries` /
  * `oracleSql` maps the driver consumes, and ContractSpec keeps the
  * key sets equal. */
private[graft] object MultimodalQueries extends QueryFamily {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ---- perceptual image hash dedup (q116): the image-corpus analog of
    // q16's text fingerprint — REAL PNG decode (q70 codec), 8x8 nearest-
    // neighbor thumbnail (q110 stride arithmetic), average-hash (bit i =
    // thumb pixel i > thumbnail mean) packed into two 32-bit halves, and
    // hash-group dedup stats. Payloads are synthetic (base = doc_id % 37
    // drives dims+pixels) so the DuckDB twin replays decode+resize+hash
    // from the generating formula — a wrong stride, threshold, or bit
    // order breaks the hash. Scale shape: decode+hash are MAP-SIDE (the
    // image bytes never shuffle); only (hash, doc_id) reaches the
    // exchange — the shape that dedups a billion-image corpus. ----------
    "q116_image_ahash" -> ((s, dir) => {
      val mk = udf { (docId: Long) =>
        val base = docId % 37
        val w = (6 + base % 5).toInt
        val h = (4 + (base * 3) % 4).toInt
        val px = Array.tabulate(w * h)(i => ((base * 31 + i * 7) % 256).toByte)
        graft.multimodal.PngCodec.encode(w, h, 1, px)
      }
      val withPng = docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
      val thumb = graft.multimodal.Multimodal.resizePixelsDyn(col("decoded"),
        col("decoded.width"), col("decoded.height"), 8, 8)
      // exact integer pixels (q70's lossless float roundtrip contract)
      val tp = graft.multimodal.Multimodal.decodeImages(withPng, "payload")
        .select(col("doc_id"),
          transform(thumb, p => round(p * lit(255.0f)).cast("long")).as("tp"))
        .withColumn("avg64",
          aggregate(col("tp"), lit(0L), (a, p) => a + p).cast("double") / lit(64.0))
      // one 32-bit half: sum of exact powers of two (every term and the
      // total are < 2^32, so the double accumulator is integer-exact)
      def half(off: Int): Column = aggregate(
        zip_with(slice(col("tp"), off + 1, 32), sequence(lit(0), lit(31)),
          (p, i) => when(p.cast("double") > col("avg64"), pow(lit(2.0), i))
            .otherwise(lit(0.0))),
        lit(0.0), (a, x) => a + x).cast("long")
      tp.select(col("doc_id"), half(0).as("ahash_lo"), half(32).as("ahash_hi"))
        .groupBy("ahash_lo", "ahash_hi")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
        .withColumn("dup_pairs", expr("n_docs * (n_docs - 1) div 2"))
    }),

    // ---- real BMP decode, oracle-checked end to end (q133): the third
    // genuine codec (after PNG q70 / WAV q74) — 8-bit paletted gray,
    // BOTTOM-UP rows padded to 4-byte boundaries (widths 3..9 make the
    // padding branch fire on most docs). The oracle recomputes pixel
    // sums from the generating formula, so a wrong row order or pad
    // stride breaks the hash. -------------------------------------------
    "q133_bmp_decode" -> ((s, dir) => {
      val mk = udf { (docId: Long) =>
        val w = (3 + docId % 7).toInt
        val h = (2 + (docId * 5) % 4).toInt
        val px = Array.tabulate(w * h)(i => ((docId * 17 + i * 11) % 256).toByte)
        graft.multimodal.BmpCodec.encode(w, h, px)
      }
      val dec = udf { (bytes: Array[Byte]) =>
        graft.multimodal.BmpCodec.decode(bytes).map { d =>
          (d.width, d.height, d.pixels.length.toLong,
            d.pixels.map(p => (p & 0xFF).toLong).sum)
        }.orNull
      }
      docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .select(col("doc_id"), dec(col("payload"))
          .cast("struct<width: int, height: int, n_px: bigint, px_sum: bigint>")
          .as("d"))
        .select(col("doc_id"), col("d.width").as("width"),
          col("d.height").as("height"), col("d.n_px").as("n_px"),
          col("d.px_sum").as("px_sum"))
    }),

    // ---- multimodal metadata (oracle: binaries constructed in SQL both
    // sides, dimensions extracted back by the header parsers) ------------
    "q52_multimodal_meta" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (lit(16) + col("doc_id") % 1920).cast("int").as("w"),
        (lit(16) + (col("doc_id") * 7) % 1080).cast("int").as("h"))
      val bin = unhex(concat(
        lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(col("w")), 8, "0"), lpad(hex(col("h")), 8, "0"),
        lit("0802000000")))
      val payload = d.withColumn("payload", bin)
      payload.select(col("doc_id"),
        graft.multimodal.Multimodal.sniffFormat(col("payload")).as("format"),
        graft.multimodal.Multimodal.pngWidth(col("payload")).as("width"),
        graft.multimodal.Multimodal.pngHeight(col("payload")).as("height"),
        length(col("payload")).cast("long").as("n_bytes"))
    }),

    // ---- video container metadata (VIDEO leg of the multimodal family:
    // real ISO-BMFF box walker + mvhd parse; per-doc MP4s are constructed
    // by the REAL encoder and round-tripped through the REAL parser, the
    // oracle recomputes every field from the generating formulas — q52/q70
    // pattern. Frame-sample timestamps are the metadata-derived work list
    // a decode stage consumes (codec decode is out of scope by contract:
    // no video codecs in a plain JVM). --------------------------------
    "q80_video_meta" -> ((s, dir) => {
      val mk = udf { (docId: Long) =>
        graft.multimodal.Mp4.encodeMinimal("isom", 600L, (30 + docId % 600) * 600L)
      }
      val parse = udf { (bytes: Array[Byte]) =>
        graft.multimodal.Mp4.parse(bytes).map { m =>
          (m.brand, m.timescale, m.duration,
            m.duration / math.max(m.timescale, 1L),
            graft.multimodal.Mp4.frameSampleTimestamps(m.timescale, m.duration, 10L)
              .length.toLong)
        }.orNull
      }
      docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .select(col("doc_id"),
          graft.multimodal.Multimodal.sniffFormat(col("payload")).as("format"),
          parse(col("payload")).cast(
            "struct<brand:string,timescale:bigint,duration:bigint," +
              "duration_sec:bigint,n_sample_points:bigint>").as("m"))
        .select(col("doc_id"), col("format"), col("m.brand").as("brand"),
          col("m.timescale").as("timescale"), col("m.duration").as("duration"),
          col("m.duration_sec").as("duration_sec"),
          col("m.n_sample_points").as("n_sample_points"))
    }),

    // ---- real PNG decode, oracle-checked end to end --------------------
    // Per doc: a REAL gray PNG is encoded (PngCodec.encode: zlib deflate)
    // with pixel(i) = (doc_id*31 + i*7) % 256, then decoded by the
    // pure-JVM decoder (inflate + un-filter). The oracle recomputes the
    // pixel sums straight from the generating formula, so a wrong decode
    // (off-by-one filter, bad inflate reassembly, channel mixup) breaks
    // the hash — codec correctness is gated, not assumed.
    "q70_png_decode" -> ((s, dir) => {
      val mk = udf { (docId: Long) =>
        val w = (3 + docId % 6).toInt
        val h = (2 + (docId * 7) % 5).toInt
        val px = Array.tabulate(w * h)(i => ((docId * 31 + i * 7) % 256).toByte)
        graft.multimodal.PngCodec.encode(w, h, 1, px)
      }
      val withPng = docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
      graft.multimodal.Multimodal.decodeImages(withPng, "payload")
        .select(col("doc_id"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          size(col("decoded.pixels")).cast("long").as("n_px"),
          aggregate(col("decoded.pixels"), lit(0L),
            (acc, p) => acc + round(p * 255.0f).cast("long")).as("px_sum"))
    }),

    // ---- decode -> RESIZE -> aggregate, oracle-checked (q110): the
    // missing action step between q70's decode gate and feature
    // extraction — every doc's synthetic PNG is decoded for real, stride-
    // resampled (nearest-neighbor) to a fixed 4x3 thumbnail with per-row
    // source dims, and the thumbnail's integer pixel sum must match the
    // oracle's replay of the same stride arithmetic on the generating
    // formula. A wrong stride (row-major mixup, off-by-one, double-vs-int
    // division drift) breaks the hash. --------------------------------
    "q110_image_resize" -> ((s, dir) => {
      val mk = udf { (docId: Long) =>
        val w = (3 + docId % 6).toInt
        val h = (2 + (docId * 7) % 5).toInt
        val px = Array.tabulate(w * h)(i => ((docId * 31 + i * 7) % 256).toByte)
        graft.multimodal.PngCodec.encode(w, h, 1, px)
      }
      val withPng = docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
      graft.multimodal.Multimodal.decodeImages(withPng, "payload")
        .select(col("doc_id"),
          graft.multimodal.Multimodal.resizePixelsDyn(col("decoded"),
            col("decoded.width"), col("decoded.height"), 4, 3).as("thumb"))
        .select(col("doc_id"),
          size(col("thumb")).cast("long").as("n_px"),
          aggregate(col("thumb"), lit(0L),
            (acc, p) => acc + round(p * 255.0f).cast("long")).as("px_sum"))
    }),

    // ---- real WAV PCM decode, oracle-checked end to end (q70 pattern) --
    "q74_wav_decode" -> ((s, dir) => {
      val mk = udf { (docId: Long) =>
        val n = (50 + docId % 40).toInt
        val samples = Array.tabulate(n)(i =>
          ((docId * 13 + i * 7) % 2001 - 1000).toShort)
        graft.multimodal.WavCodec.encodePcm16(8000 + (docId % 3).toInt * 4000, 1, samples)
      }
      val dec = udf { (bytes: Array[Byte]) =>
        graft.multimodal.WavCodec.decode(bytes).map { d =>
          // reconstruct the exact int16 values from the float samples
          val ints = d.samples.map(f => math.round(f * 32768.0f).toLong)
          (d.sampleRate, d.samples.length.toLong, ints.sum)
        }.orNull
      }
      docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .select(col("doc_id"),
          dec(col("payload")).cast("struct<sample_rate: int, n_samples: bigint, sample_sum: bigint>").as("d"))
        .select(col("doc_id"), col("d.sample_rate").as("sample_rate"),
          col("d.n_samples").as("n_samples"), col("d.sample_sum").as("sample_sum"))
    }),

    // ---- audio decode -> frame -> features, oracle-checked end to end --
    "q75_audio_features" -> ((s, dir) => {
      val mk = udf { (docId: Long) =>
        val n = (50 + docId % 40).toInt
        val samples = Array.tabulate(n)(i =>
          ((docId * 13 + i * 7) % 2001 - 1000).toShort)
        graft.multimodal.WavCodec.encodePcm16(8000, 1, samples)
      }
      val withWav = docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
      graft.multimodal.Multimodal.audioFrameFeatures(withWav, "payload", frameLen = 25)
        .select(col("doc_id"), col("frame_idx"),
          round(col("rms"), 6).as("rms"), col("zero_crossings"))
    }),

    // ---- FFT spectral features (q203): encode a pure tone at an EXACT
    // bin-center frequency (f = k * sr/N, k = 8 + doc_id % 100) as real
    // PCM16 WAV, decode it back, and run a 256-point radix-2 FFT
    // (util/Fft) per clip. The oracle gates the dominant one-sided bin
    // (must equal the generating k), the peak magnitude against the
    // closed-form N/2 * amplitude (ratio rounds to 1.0 — int16
    // quantization perturbs it by < 2e-4), the next-peak leakage (rounds
    // to 0.0 at a bin-centered tone), and the Parseval residual. One
    // map-side transform per row; nothing shuffles but the result. ------
    "q203_fft_spectral" -> ((s, dir) => {
      val sr = 8000
      val n = 256
      val amp = 8000.0
      val mk = udf { (docId: Long) =>
        val k = (8 + docId % 100).toInt
        val samples = Array.tabulate(n)(i =>
          math.round(amp * math.sin(2.0 * math.Pi * k * i / n)).toShort)
        graft.multimodal.WavCodec.encodePcm16(sr, 1, samples)
      }
      val spect = udf { (bytes: Array[Byte]) =>
        graft.multimodal.WavCodec.decode(bytes).map { d =>
          val x = d.samples.map(f => math.round(f * 32768.0f).toDouble)
          val mags = graft.util.Fft.spectrum(x)
          // dominant bin over k in [1, n/2] (skip DC), id-free argmax:
          // strictly-greater keeps the lowest index on exact ties
          var kBest = 1
          var i = 2
          while (i < mags.length) {
            if (mags(i) > mags(kBest)) kBest = i
            i += 1
          }
          var second = 0.0
          i = 1
          while (i < mags.length) {
            if (i != kBest && mags(i) > second) second = mags(i)
            i += 1
          }
          val sumsqTime = x.map(v => v * v).sum
          val sumsqFreq = {
            val re = x.clone(); val im = new Array[Double](x.length)
            graft.util.Fft.fft(re, im)
            re.indices.map(j => re(j) * re(j) + im(j) * im(j)).sum / x.length
          }
          (kBest.toLong, mags(kBest) / (x.length / 2 * amp),
            second / mags(kBest),
            math.abs(sumsqTime - sumsqFreq) / sumsqTime)
        }.orNull
      }
      docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .select(col("doc_id"), spect(col("payload"))
          .cast("struct<bin: bigint, mag: double, second: double, pres: double>").as("d"))
        .select(col("doc_id"), col("d.bin").as("dominant_bin"),
          round(col("d.mag"), 2).as("mag_ratio"),
          round(col("d.second"), 1).as("leak_ratio"),
          round(col("d.pres"), 6).as("parseval_resid"))
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

    // MP4 metadata recomputed from the generating formulas; the Spark side
    // must round-trip them through the real encoder + box parser.
    "q80_video_meta" ->
      """WITH d AS (SELECT doc_id, CAST(600 AS BIGINT) AS timescale,
           CAST((30 + doc_id % 600) * 600 AS BIGINT) AS duration FROM documents)
         SELECT doc_id, 'mp4' AS format, 'isom' AS brand, timescale, duration,
           CAST(duration // timescale AS BIGINT) AS duration_sec,
           CAST(duration // timescale // 10 + 1 AS BIGINT) AS n_sample_points
         FROM d""",

    "q52_multimodal_meta" ->
      """WITH d AS (SELECT doc_id,
           CAST(16 + doc_id % 1920 AS INT) AS w,
           CAST(16 + (doc_id * 7) % 1080 AS INT) AS h FROM documents),
         p AS (SELECT doc_id, w, h,
           unhex('89504E470D0A1A0A0000000D49484452' || printf('%08X', w)
             || printf('%08X', h) || '0802000000') AS payload FROM d)
         SELECT doc_id,
           CASE WHEN hex(payload) LIKE '89504E470D0A1A0A%'
             THEN 'png' ELSE 'unknown' END AS format,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes
         FROM p""",

    "q75_audio_features" ->
      """WITH d AS (SELECT doc_id, CAST(50 + doc_id % 40 AS INT) AS n FROM documents),
         f AS (SELECT doc_id, n, unnest(range(0, n // 25)) AS frame_idx FROM d),
         s AS (SELECT doc_id, frame_idx,
           list_transform(range(0, 25),
             i -> CAST((doc_id * 13 + (frame_idx * 25 + i) * 7) % 2001 - 1000 AS DOUBLE)
               / 32768.0) AS v
           FROM f)
         SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           round(sqrt(list_sum(list_transform(v, x -> x * x)) / 25.0), 6) AS rms,
           CAST(list_sum(list_transform(range(1, 25),
             i -> CASE WHEN (v[i + 1] >= 0) != (v[i] >= 0) THEN 1 ELSE 0 END)) AS INT)
             AS zero_crossings
         FROM s""",

    "q74_wav_decode" ->
      """WITH d AS (SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(50 + doc_id % 40 AS BIGINT) AS n_samples FROM documents)
         SELECT d.doc_id, d.sample_rate, d.n_samples,
           CAST(list_sum(list_transform(range(0, CAST(d.n_samples AS INT)),
             i -> (d.doc_id * 13 + i * 7) % 2001 - 1000)) AS BIGINT) AS sample_sum
         FROM d""",

    "q70_png_decode" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 6 AS INT) AS width,
           CAST(2 + (doc_id * 7) % 5 AS INT) AS height FROM documents)
         SELECT d.doc_id, d.width, d.height,
           CAST(d.width * d.height AS BIGINT) AS n_px,
           CAST(list_sum(list_transform(range(0, d.width * d.height),
             i -> (d.doc_id * 31 + i * 7) % 256)) AS BIGINT) AS px_sum
         FROM d""",

    // Resize twin: replay the nearest-neighbor stride arithmetic
    // (double division + floor, exactly as the Spark column math) on the
    // q70 generating formula; the decoded float roundtrip is exact (q70).
    "q110_image_resize" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 6 AS INT) AS w,
           CAST(2 + (doc_id * 7) % 5 AS INT) AS h FROM documents)
         SELECT doc_id, CAST(12 AS BIGINT) AS n_px,
           CAST(list_sum(list_transform(range(0, 12), i ->
             (doc_id * 31 +
              (CAST(floor((i // 4) * h / 3.0) AS BIGINT) * w +
               CAST(floor((i % 4) * w / 4.0) AS BIGINT)) * 7) % 256))
             AS BIGINT) AS px_sum
         FROM d""",

    // aHash twin: replay decode (generating formula, exact per q70),
    // the 8x8 nearest-neighbor stride (q110 double-division arithmetic),
    // the mean threshold, and the per-half bit packing; then the same
    // hash-group dedup stats. Integer shifts stay < 2^32 per half.
    "q116_image_ahash" ->
      """WITH d AS (SELECT doc_id, doc_id % 37 AS base FROM documents),
         dims AS (SELECT doc_id, base,
           CAST(6 + base % 5 AS BIGINT) AS w,
           CAST(4 + (base * 3) % 4 AS BIGINT) AS h FROM d),
         tp AS (SELECT doc_id, list_transform(range(0, 64), i ->
             (base * 31 +
              (CAST(floor((i // 8) * h / 8.0) AS BIGINT) * w +
               CAST(floor((i % 8) * w / 8.0) AS BIGINT)) * 7) % 256) AS px
           FROM dims),
         m AS (SELECT doc_id, px,
           CAST(list_sum(px) AS DOUBLE) / 64.0 AS avg64 FROM tp),
         hsh AS (SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 32), j ->
             CASE WHEN px[j + 1] > avg64 THEN 1::BIGINT << j
                  ELSE 0::BIGINT END)) AS BIGINT) AS ahash_lo,
           CAST(list_sum(list_transform(range(0, 32), j ->
             CASE WHEN px[j + 33] > avg64 THEN 1::BIGINT << j
                  ELSE 0::BIGINT END)) AS BIGINT) AS ahash_hi
           FROM m)
         SELECT ahash_lo, ahash_hi, CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keep_doc,
           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS dup_pairs
         FROM hsh GROUP BY 1, 2""",

    // BMP twin: replay the generating formula (q70 convention — decode
    // correctness is gated by the formula-derived pixel sums).
    "q133_bmp_decode" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 7 AS INT) AS width,
           CAST(2 + (doc_id * 5) % 4 AS INT) AS height FROM documents)
         SELECT doc_id, width, height,
           CAST(width * height AS BIGINT) AS n_px,
           CAST(list_sum(list_transform(range(0, width * height),
             i -> (doc_id * 17 + i * 11) % 256)) AS BIGINT) AS px_sum
         FROM d""",

    // FFT twin: a bin-centered tone's spectrum is closed-form — the
    // dominant bin IS the generating k, the peak magnitude is N/2 * amp
    // (ratio 1.0 at 2 dp under int16 quantization), leakage and the
    // Parseval residual round to zero. The Spark side must reproduce
    // these through the real WAV encode/decode + radix-2 transform.
    "q203_fft_spectral" ->
      """SELECT doc_id, CAST(8 + doc_id % 100 AS BIGINT) AS dominant_bin,
           1.0 AS mag_ratio, 0.0 AS leak_ratio, 0.0 AS parseval_resid
         FROM documents""",
  )
}
