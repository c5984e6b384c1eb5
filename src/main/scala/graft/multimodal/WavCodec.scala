package graft.multimodal

/** Pure-JVM WAV (RIFF) PCM codec: chunk-walking parser + 8/16-bit PCM
  * sample decode to floats in [-1, 1), and a canonical-header encoder for
  * fixtures and the oracle-gated decode query. Like PngCodec, the contract
  * is "decoded or None" — compressed/float WAV variants (non-PCM format
  * tags) and truncated payloads return None, never fabricated samples. */
object WavCodec {

  case class Decoded(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     samples: Array[Float])

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Decode a RIFF/WAVE byte stream (walks chunks; fmt must be PCM
    * (tag 1) with 8 or 16 bits per sample). Channel-interleaved floats. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var off = 12
    var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = leInt(bytes, off + 4)
      // does a plausible RIFF chunk start at `o`? (printable ASCII id +
      // in-bounds length) — used to distinguish a genuinely empty data
      // chunk followed by more chunks from a streaming-writer zero length
      def chunkStartsAt(o: Int): Boolean =
        o + 8 <= bytes.length &&
          (o until o + 4).forall(k => bytes(k) >= 0x20 && bytes(k) <= 0x7E) && {
            val l = leInt(bytes, o + 4)
            l >= 0 && o + 8 + l.toLong <= bytes.length
          }
      if (len < 0 || off + 8 + len.toLong > bytes.length) {
        return None // malformed/truncated chunk
      } else {
        id match {
          case "fmt " =>
            if (len < 16) return None
            fmtTag = leShort(bytes, off + 8)
            channels = leShort(bytes, off + 10)
            rate = leInt(bytes, off + 12)
            bits = leShort(bytes, off + 22)
          case "data" if len == 0 && off + 8 < bytes.length && !chunkStartsAt(off + 8) =>
            // streaming-writer convention: zero length stamped before
            // close, raw samples to EOF. Only taken when the trailing
            // bytes are NOT another parseable chunk — a real empty data
            // chunk followed by LIST/fact metadata must never be
            // reinterpreted as audio (decoded-or-None contract).
            dataOff = off + 8; dataLen = bytes.length - dataOff
            off = bytes.length
          case "data" => dataOff = off + 8; dataLen = len
          case _ => ()
        }
        if (off < bytes.length) off += 8 + len + (len & 1) // word-aligned
      }
    }
    if (fmtTag != 1 || channels <= 0 || rate <= 0 || dataOff < 0) return None
    bits match {
      case 16 =>
        val n = dataLen / 2
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          val v = (leShort(bytes, dataOff + 2 * i).toShort).toInt
          out(i) = v / 32768.0f
          i += 1
        }
        Some(Decoded(rate, channels, 16, out))
      case 8 => // unsigned 8-bit convention
        val n = dataLen
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          out(i) = ((bytes(dataOff + i) & 0xFF) - 128) / 128.0f
          i += 1
        }
        Some(Decoded(rate, channels, 8, out))
      case _ => None
    }
  }

  /** Canonical 44-byte-header 16-bit PCM encoder (fixture/oracle use). */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putStr(off: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, off)
    def putLeInt(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    putStr(0, "RIFF"); putLeInt(4, 36 + dataLen); putStr(8, "WAVE")
    putStr(12, "fmt "); putLeInt(16, 16); putLeShort(20, 1)
    putLeShort(22, channels); putLeInt(24, sampleRate)
    putLeInt(28, sampleRate * channels * 2); putLeShort(32, channels * 2)
    putLeShort(34, 16)
    putStr(36, "data"); putLeInt(40, dataLen)
    var i = 0
    while (i < samples.length) { putLeShort(44 + 2 * i, samples(i)); i += 1 }
    out
  }
}
