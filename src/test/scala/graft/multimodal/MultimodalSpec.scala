package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Multimodal binary ops: real handcrafted container headers in, metadata
  * out; tokenizer counts vs hand counts. */
class MultimodalSpec extends SparkSpec with Matchers {

  def hexBytes(hx: String): Array[Byte] =
    hx.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Minimal real PNG: signature + IHDR for 640x480. */
  val png640x480: Array[Byte] = hexBytes(
    "89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 02 00 00 00")

  /** GIF89a header, 320x200 little-endian. */
  val gif320x200: Array[Byte] = hexBytes("474946383961 4001 C800 F7 00 00")

  /** BMP header: 'BM' + 16 filler bytes then LE width=100, height=50. */
  val bmp100x50: Array[Byte] = hexBytes(
    "424D 00000000 0000 0000 36000000 28000000 64000000 32000000")

  /** Canonical 44-byte WAV header: mono, 16-bit, 8000 Hz + 16000 bytes of
    * data => 1 second. */
  val wav8k: Array[Byte] = {
    val header = hexBytes(
      "52494646 24000000 57415645 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000 64617461 00000000")
    header ++ new Array[Byte](16000)
  }

  /** Tiny JPEG: SOI + SOF0 marker with height=240 width=360. */
  val jpeg360x240: Array[Byte] = hexBytes(
    "FFD8 FFE0 0010 4A46494600 0101 00 0048 0048 0000" +
    "FFC0 0011 08 00F0 0168 03 01 22 00 02 11 01 03 11 01" +
    "FFD9")

  def binDf(rows: (Long, Array[Byte])*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "payload")
  }

  test("format sniffing identifies png/gif/bmp/wav/jpeg and unknown") {
    val df = binDf(1L -> png640x480, 2L -> gif320x200, 3L -> bmp100x50,
      4L -> wav8k, 5L -> jpeg360x240, 6L -> "hello world".getBytes)
    val out = df.select(col("id"), Multimodal.sniffFormat(col("payload")).as("fmt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "png", 2L -> "gif", 3L -> "bmp",
      4L -> "wav", 5L -> "jpeg", 6L -> "unknown")
  }

  test("metadata extracts correct dimensions and duration") {
    val df = binDf(1L -> png640x480, 2L -> gif320x200, 3L -> bmp100x50,
      4L -> wav8k, 5L -> jpeg360x240)
    val meta = df.select(col("id"), Multimodal.metadata(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"),
        col("m.sample_rate"), col("m.duration_sec"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .toMap
    meta(1L)._2 shouldBe Some(640L); meta(1L)._3 shouldBe Some(480L)
    meta(2L)._2 shouldBe Some(320L); meta(2L)._3 shouldBe Some(200L)
    meta(3L)._2 shouldBe Some(100L); meta(3L)._3 shouldBe Some(50L)
    meta(4L)._4 shouldBe Some(8000L)
    meta(4L)._5.get.asInstanceOf[Double] shouldBe 1.0 +- 1e-9
    meta(5L)._2 shouldBe Some(360L); meta(5L)._3 shouldBe Some(240L)
  }

  test("decode plumbing: real decode, schema, honest null, resize") {
    // a REAL 8x8 gray PNG (zlib-deflated) decodes to its exact pixels;
    // a header-only payload (no IDAT) decodes to NULL, never fake pixels
    val realPng = PngCodec.encode(8, 8, 1, Array.tabulate[Byte](64)(i => (i * 3).toByte))
    val df = binDf(1L -> realPng, 2L -> realPng, 3L -> png640x480)
    val dec = Multimodal.decodeImages(df, "payload")
    val rows = dec.where(col("id") =!= 3)
      .select(col("decoded.width"), col("decoded.height"),
        col("decoded.channels"), expr("size(decoded.pixels)")).collect()
    rows should have length 2
    rows.foreach { r =>
      r.getInt(0) shouldBe 8
      r.getInt(1) shouldBe 8
      r.getInt(2) shouldBe 1
      r.getInt(3) shouldBe 64
    }
    // pixel values are the real ones
    val px = dec.where(col("id") =!= 3)
      .select(col("decoded.pixels")).collect().map(_.getSeq[Float](0))
    px(0) shouldBe px(1)
    (0 until 64).foreach(i => (px(0)(i) * 255.0f).round shouldBe ((i * 3).toByte & 0xFF))
    // header-only png: honest null
    dec.where(col("id") === 3).select(col("decoded").isNull).collect()
      .head.getBoolean(0) shouldBe true
    // resize 8x8 -> 4x4 via stride sampling
    val resized = dec.where(col("id") === 1)
      .select(Multimodal.resizePixels(col("decoded"), 8, 8, 4, 4).as("r"))
    resized.select(expr("size(r)")).collect().head.getInt(0) shouldBe 16
  }

  test("frame sampling emits bounded fixed-size frames") {
    val payload = new Array[Byte](1000)
    val df = binDf(1L -> payload)
    val frames = Multimodal.sampleFrames(df, "payload", frameBytes = 100, every = 2)
    val n = frames.count()
    n shouldBe 5 // 1000 / (100*2)
    frames.select(expr("length(frame)")).collect().foreach(_.getInt(0) shouldBe 100)
  }


  test("wav codec: pcm16 round trip, canonical fixture, honest None") {
    val rng = new scala.util.Random(11)
    val samples = Array.fill[Short](500)((rng.nextInt(65536) - 32768).toShort)
    val d = WavCodec.decode(WavCodec.encodePcm16(44100, 2, samples)).get
    d.sampleRate shouldBe 44100
    d.channels shouldBe 2
    d.bitsPerSample shouldBe 16
    d.samples.length shouldBe 500
    samples.indices.foreach(i =>
      math.round(d.samples(i) * 32768.0f).toShort shouldBe samples(i))
    // the spec fixture: 16000 bytes of 16-bit silence at 8 kHz
    val f = WavCodec.decode(wav8k).get
    f.sampleRate shouldBe 8000
    f.samples.length shouldBe 8000
    f.samples.forall(_ == 0.0f) shouldBe true
    WavCodec.decode("RIFFnope".getBytes ++ new Array[Byte](64)) shouldBe None
    WavCodec.decode(null) shouldBe None
  }


  test("wav codec: empty data chunk + trailing LIST metadata is not audio") {
    // canonical header with len-0 data chunk, then a valid LIST chunk —
    // the metadata bytes must NOT be reinterpreted as samples
    val base = WavCodec.encodePcm16(8000, 1, Array.empty[Short])
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](8, 0, 0, 0) ++ "INFOdata".getBytes("US-ASCII")
    val d = WavCodec.decode(base ++ listChunk).get
    d.samples.length shouldBe 0
    // whereas raw non-chunk trailing bytes ARE streaming samples
    val streaming = WavCodec.decode(base ++ Array[Byte](0, 0, 0, 0)).get
    streaming.samples.length shouldBe 2
  }

  test("audio frame features downmix stereo before framing") {
    import spark.implicits._
    // constant L=+8192, R=-8192: mono mix is 0, so RMS 0 and NO crossings
    val stereo = WavCodec.encodePcm16(8000, 2,
      Array.tabulate[Short](100)(i => if (i % 2 == 0) 8192 else -8192))
    val df = Seq((1L, stereo)).toDF("id", "payload")
    val out = Multimodal.audioFrameFeatures(df, "payload", frameLen = 25).collect()
    out.length shouldBe 2 // 50 mono steps / 25
    out.foreach { r =>
      r.getAs[Double]("rms") shouldBe 0.0 +- 1e-12
      r.getAs[Int]("zero_crossings") shouldBe 0
    }
  }

  test("pre-token count matches hand count on GPT-2-style boundaries") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello world"),          // [Hello][ world] = 2
      (2L, "don't stop"),           // [don]['t][ stop] = 3
      (3L, "a1b2"),                 // [a][1][b][2] = 4
      (4L, "x == 42!")              // [x][ ==][ 42][!] = 4
    ).toDF("id", "text")
    val out = df.select(col("id"), Tokenize.preTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 4L)
  }

  test("subword estimate adds splits for long words") {
    import spark.implicits._
    val df = Seq((1L, "short"), (2L, "internationalization")).toDF("id", "text")
    val out = df.select(col("id"), Tokenize.subwordCountEstimate(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 1L
    out(2L) should be > 2L
  }
}
