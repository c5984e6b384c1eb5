package graft.multimodal

import java.util.zip.{Deflater, Inflater, CRC32}

/** Pure-JVM PNG codec: real IDAT inflate (java.util.zip) + scanline
  * un-filtering (all five PNG filter types) for 8-bit gray / gray+alpha /
  * RGB / RGBA / palette images, and a minimal encoder for fixtures and
  * round-trip tests. No external codec dependency — this replaces the
  * r02 "deterministic fake plane" stub with an actual decoder (PNG spec,
  * RFC 2083; zlib streams via the JDK Inflater/Deflater).
  *
  * Deliberately out of scope (returns None): 16-bit depth, sub-8-bit
  * packed depths, Adam7 interlacing — the honest contract is "decoded or
  * None", never fabricated pixels. */
object PngCodec {

  private val Signature = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Decode a PNG byte stream. Returns pixel bytes in row-major
    * channel-interleaved order (palette expanded to RGB). */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 45) return None
    if (!Signature.indices.forall(i => bytes(i) == Signature(i))) return None
    var off = 8
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    var interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (off + 8 <= bytes.length && !sawEnd) {
      val len = beInt(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return None
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len < 13) return None
          width = beInt(bytes, off + 8)
          height = beInt(bytes, off + 12)
          bitDepth = bytes(off + 16) & 0xFF
          colorType = bytes(off + 17) & 0xFF
          interlace = bytes(off + 20) & 0xFF
        case "PLTE" => palette = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk
      }
      off += 12 + len
    }
    if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 3 => 1 // palette index (expanded below)
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return None
    }
    if (colorType == 3 && palette == null) return None
    if (width.toLong * height * channels > Int.MaxValue / 4) return None

    // inflate all IDAT data
    val compressed = idat.toByteArray
    if (compressed.isEmpty) return None
    val bpr = width * channels // bytes per row (8-bit depth)
    val raw = new Array[Byte]((bpr + 1) * height)
    val inf = new Inflater()
    inf.setInput(compressed)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 while unfinished means needsInput (truncated) OR
        // needsDictionary (FDICT streams, unsupported) — either way bail,
        // never spin: one adversarial payload must not wedge an executor
        if (n == 0) return None
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got < raw.length) return None

    // un-filter scanlines (PNG spec 6.2: None/Sub/Up/Average/Paeth)
    val bpp = channels // bytes per pixel at 8-bit depth
    val out = new Array[Byte](bpr * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (bpr + 1)) & 0xFF
      val src = y * (bpr + 1) + 1
      val dst = y * bpr
      var x = 0
      filter match {
        case 0 =>
          System.arraycopy(raw, src, out, dst, bpr)
        case 1 => // Sub
          while (x < bpr) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + left).toByte
            x += 1
          }
        case 2 => // Up
          while (x < bpr) {
            val up = if (y > 0) out(dst - bpr + x) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + up).toByte
            x += 1
          }
        case 3 => // Average
          while (x < bpr) {
            val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            val up = if (y > 0) out(dst - bpr + x) & 0xFF else 0
            out(dst + x) = ((raw(src + x) & 0xFF) + (left + up) / 2).toByte
            x += 1
          }
        case 4 => // Paeth
          while (x < bpr) {
            val a = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
            val b = if (y > 0) out(dst - bpr + x) & 0xFF else 0
            val c = if (x >= bpp && y > 0) out(dst - bpr + x - bpp) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(dst + x) = ((raw(src + x) & 0xFF) + pred).toByte
            x += 1
          }
        case _ => return None
      }
      y += 1
    }

    if (colorType == 3) {
      // expand palette indices to RGB
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < width * height) {
        val idx = (out(i) & 0xFF) * 3
        if (idx + 2 >= palette.length) return None
        rgb(i * 3) = palette(idx)
        rgb(i * 3 + 1) = palette(idx + 1)
        rgb(i * 3 + 2) = palette(idx + 2)
        i += 1
      }
      Some(Decoded(width, height, 3, rgb))
    } else Some(Decoded(width, height, channels, out))
  }

  /** Minimal encoder (8-bit gray or RGB, filter None per row, one zlib
    * stream) — for fixtures, round-trips and the oracle-checked decode
    * query; not a production optimizer. */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, "encoder supports gray or rgb")
    require(pixels.length == width * height * channels, "pixel buffer size mismatch")
    val bpr = width * channels
    val raw = new Array[Byte]((bpr + 1) * height)
    for (y <- 0 until height) {
      raw(y * (bpr + 1)) = 0 // filter None
      System.arraycopy(pixels, y * bpr, raw, y * (bpr + 1) + 1, bpr)
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 1024)
    val outStream = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      outStream.write(buf, 0, n)
    }
    deflater.end()
    val idatData = outStream.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    def writeChunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val c = crc.getValue
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte), 0, 4)
    }
    val colorType = if (channels == 1) 0 else 2
    writeChunk("IHDR", Array(
      (width >>> 24).toByte, (width >>> 16).toByte, (width >>> 8).toByte, width.toByte,
      (height >>> 24).toByte, (height >>> 16).toByte, (height >>> 8).toByte, height.toByte,
      8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))
    writeChunk("IDAT", idatData)
    writeChunk("IEND", Array.empty[Byte])
    out.toByteArray
  }
}
