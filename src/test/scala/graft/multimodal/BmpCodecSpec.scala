package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure-JVM BMP codec (q133). */
class BmpCodecSpec extends AnyFunSuite with Matchers {

  test("roundtrip is pixel-exact across padding widths") {
    for (w <- 1 to 9; h <- 1 to 4) {
      val px = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256).toByte)
      val dec = BmpCodec.decode(BmpCodec.encode(w, h, px))
      assert(dec.isDefined, s"decode failed at ${w}x$h")
      dec.get.width shouldBe w
      dec.get.height shouldBe h
      dec.get.pixels.toSeq shouldBe px.toSeq
    }
  }

  test("bottom-up storage: hand-built 2x2 decodes top-down") {
    // pixels top-down: [10, 20] / [30, 40]
    val enc = BmpCodec.encode(2, 2, Array[Byte](10, 20, 30, 40))
    // in the FILE the first stored row must be the BOTTOM row (30, 40)
    val dataOff = 14 + 40 + 256 * 4
    enc(dataOff) shouldBe 30.toByte
    enc(dataOff + 1) shouldBe 40.toByte
    val dec = BmpCodec.decode(enc).get
    dec.pixels.toSeq shouldBe Seq[Byte](10, 20, 30, 40)
  }

  test("top-down files (negative height) are accepted") {
    val enc = BmpCodec.encode(3, 2, Array[Byte](1, 2, 3, 4, 5, 6))
    // rewrite as top-down: negate height, store rows in top-down order
    val h = -2
    enc(22) = (h & 0xFF).toByte; enc(23) = ((h >> 8) & 0xFF).toByte
    enc(24) = ((h >> 16) & 0xFF).toByte; enc(25) = ((h >> 24) & 0xFF).toByte
    val dataOff = 14 + 40 + 256 * 4
    val rowBytes = 4 // width 3 padded to 4
    // top-down: row0 = (1,2,3), row1 = (4,5,6)
    val rows = Array(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6))
    for (y <- 0 until 2; x <- 0 until 3) enc(dataOff + y * rowBytes + x) = rows(y)(x)
    BmpCodec.decode(enc).get.pixels.toSeq shouldBe Seq[Byte](1, 2, 3, 4, 5, 6)
  }

  test("non-BMP, truncated, and unsupported-depth inputs decode to None") {
    BmpCodec.decode(null) shouldBe None
    BmpCodec.decode(Array.fill[Byte](10)(0)) shouldBe None
    val good = BmpCodec.encode(4, 4, Array.fill[Byte](16)(7))
    BmpCodec.decode(good.take(60)) shouldBe None // truncated pixel data
    val bad = good.clone(); bad(28) = 24 // claim 24bpp
    BmpCodec.decode(bad) shouldBe None
  }
}
