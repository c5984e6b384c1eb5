package graft.multimodal

/** Minimal ISO-BMFF (MP4/MOV) container support — the VIDEO leg of the
  * multimodal column family (images: PngCodec, audio: WavCodec).
  *
  * Real here: the box walker (size/type framing, nested containers,
  * 32/64-bit sizes), ftyp brand, and movie-header (mvhd) timescale /
  * duration — everything a 100 TB video-corpus pipeline needs to
  * partition, filter and schedule frame-sampling work WITHOUT decoding.
  * Deliberately NOT here: codec frame decode (no video codecs in a plain
  * JVM); `frameSampleTimestamps` emits the sample *schedule* so a decode
  * stage (an external transcoder or GPU stage) consumes (payload, ts)
  * pairs — the Spark-side plumbing is real and tested, the pixel decode
  * is out of scope by contract.
  *
  * Box layout (ISO 14496-12): [size: u32][type: 4cc][payload]; size==1 ->
  * u64 largesize follows; size==0 -> box extends to EOF. `moov` is a pure
  * container; `mvhd` v0 carries u32 timescale at payload offset 12 and
  * u32 duration at 16 (v1: u32 at 20, u64 at 24).
  */
object Mp4 {

  case class Mp4Meta(brand: String, timescale: Long, duration: Long, nTopBoxes: Int)

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def beU64(b: Array[Byte], o: Int): Long =
    (beU32(b, o) << 32) | beU32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk one box level, returning (type, payloadStart, payloadEnd). */
  private def boxes(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Int, Int) = {
        val size32 = beU32(b, pos)
        val typ = fourcc(b, pos + 4)
        val (payloadStart, boxEnd) =
          if (size32 == 1L && pos + 16 <= end) (pos + 16L, pos + beU64(b, pos + 8))
          else if (size32 == 0L) (pos + 8L, end.toLong)
          else (pos + 8L, pos + size32)
        val clampedEnd = math.min(boxEnd, end.toLong).toInt
        val res = (typ, math.min(payloadStart, boxEnd).toInt, clampedEnd)
        pos = if (boxEnd <= pos) end else clampedEnd // malformed size: stop
        res
      }
    }

  /** Parse container metadata; None when not an ISO-BMFF payload. */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 12 || fourcc(bytes, 4) != "ftyp") return None
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var nTop = 0
    for ((typ, ps, pe) <- boxes(bytes, 0, bytes.length)) {
      nTop += 1
      typ match {
        case "ftyp" if pe - ps >= 4 => brand = fourcc(bytes, ps)
        case "moov" =>
          for ((ctyp, cps, cpe) <- boxes(bytes, ps, pe)
               if ctyp == "mvhd" && cpe - cps >= 1 && cps < bytes.length) {
            val version = bytes(cps) & 0xFF
            if (version == 0 && cpe - cps >= 20) {
              timescale = beU32(bytes, cps + 12)
              duration = beU32(bytes, cps + 16)
            } else if (version == 1 && cpe - cps >= 32) {
              timescale = beU32(bytes, cps + 20)
              duration = beU64(bytes, cps + 24)
            }
          }
        case _ =>
      }
    }
    Some(Mp4Meta(brand, timescale, duration, nTop))
  }

  /** Encode a minimal valid MP4: ftyp(brand) + moov(mvhd v0) — the test /
    * oracle fixture builder (q52-pattern: the oracle constructs the same
    * bytes in SQL and the parser must read them back). */
  def encodeMinimal(brand: String, timescale: Long, duration: Long): Array[Byte] = {
    require(brand.length == 4, "brand must be 4 chars")
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // ftyp: major brand + minor version (no compatible-brand list)
    u32(16); cc("ftyp"); cc(brand); u32(0)
    // moov { mvhd v0 }: mvhd payload = version/flags(4) + creation(4) +
    // modification(4) + timescale(4) + duration(4) + rate(4) + volume+
    // reserved(10) + matrix(36) + predefined(24) + next_track_id(4) = 100
    val mvhdSize = 8 + 100
    u32(8L + mvhdSize); cc("moov")
    u32(mvhdSize); cc("mvhd")
    u32(0) // version 0 + flags
    u32(0); u32(0) // creation, modification
    u32(timescale); u32(duration)
    u32(0x00010000L) // rate 1.0
    out.write(Array.fill[Byte](12)(0)) // volume(2) + reserved(2) + reserved2(8)
    // identity matrix
    u32(0x00010000L); u32(0); u32(0); u32(0); u32(0x00010000L); u32(0)
    u32(0); u32(0); u32(0x40000000L)
    (0 until 6).foreach(_ => u32(0)) // pre_defined
    u32(1) // next_track_id
    out.toByteArray
  }

  /** Frame-sampling schedule: media timestamps (in timescale units) every
    * `everySeconds`, derived purely from container metadata — the work
    * list a decode stage consumes. Container metadata is UNTRUSTED: a
    * malicious mvhd (u32 duration ~4.29e9 at timescale 1) would otherwise
    * materialize billions of Longs and OOM the executor, so the schedule
    * length is clamped to `maxSamples` (a week of video at 1 sample/s fits
    * the default; anything longer is a hostile or broken container, and a
    * truncated schedule is the robust-ingest answer). */
  def frameSampleTimestamps(timescale: Long, duration: Long,
                            everySeconds: Long,
                            maxSamples: Int = 604800): Seq[Long] = {
    if (timescale <= 0 || duration <= 0 || everySeconds <= 0) Seq.empty
    else (0L to (duration / timescale) by everySeconds)
      .take(maxSamples).map(_ * timescale)
      .takeWhile(_ <= duration)
  }
}
