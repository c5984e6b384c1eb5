package graft.multimodal

/** Pure-JVM BMP codec for 8-bit grayscale (BITMAPINFOHEADER, uncompressed):
  * a real decoder for the third container the sniffer recognizes (after
  * the PNG and WAV codecs) — file header + info header + 256-entry gray
  * palette + BOTTOM-UP pixel rows padded to 4-byte boundaries, the two
  * details (row order, row padding) a fake decoder gets wrong first.
  *
  * Contract matches PngCodec/WavCodec: decoded-or-None, never fabricated
  * pixels. Top-down images (negative height) are also accepted — the spec
  * allows them and they exercise the row-order branch. Out of scope
  * (None): compressed BMPs (BI_RLE8/4), depths other than 8-bit paletted
  * gray. */
object BmpCodec {

  case class Decoded(width: Int, height: Int, pixels: Array[Byte])

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Decode an 8-bit uncompressed BMP. Pixels return ROW-MAJOR TOP-DOWN
    * regardless of the file's storage order. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val dataOff = leInt(bytes, 10)
    val hdrSize = leInt(bytes, 14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val width = leInt(bytes, 18)
    val rawHeight = leInt(bytes, 22)
    val planes = leShort(bytes, 26)
    val bpp = leShort(bytes, 28)
    val compression = leInt(bytes, 30)
    if (planes != 1 || bpp != 8 || compression != 0) return None
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    if (width <= 0 || height <= 0 || width > (1 << 20) || height > (1 << 20))
      return None
    val rowBytes = (width + 3) & ~3 // rows padded to 4-byte boundaries
    if (dataOff.toLong + rowBytes.toLong * height > bytes.length) return None
    val out = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y // bottom-up storage
      val src = dataOff + srcRow * rowBytes
      System.arraycopy(bytes, src, out, y * width, width)
      y += 1
    }
    Some(Decoded(width, height, out))
  }

  /** Encode 8-bit gray pixels (row-major top-down) as a bottom-up BMP
    * with a 256-entry grayscale palette — the standard writer layout. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height, "pixel buffer size mismatch")
    val rowBytes = (width + 3) & ~3
    val dataOff = 14 + 40 + 256 * 4
    val fileSize = dataOff + rowBytes * height
    val b = new Array[Byte](fileSize)
    def putLeInt(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    putLeInt(2, fileSize); putLeInt(10, dataOff)
    putLeInt(14, 40); putLeInt(18, width); putLeInt(22, height)
    putLeShort(26, 1); putLeShort(28, 8); putLeInt(30, 0)
    putLeInt(34, rowBytes * height)
    putLeInt(46, 256) // palette entries used
    var i = 0
    while (i < 256) { // BGRA grayscale palette
      val off = 54 + i * 4
      b(off) = i.toByte; b(off + 1) = i.toByte; b(off + 2) = i.toByte
      i += 1
    }
    var y = 0
    while (y < height) {
      val dst = dataOff + (height - 1 - y) * rowBytes // bottom-up
      System.arraycopy(pixels, y * width, b, dst, width)
      y += 1
    }
    b
  }
}
