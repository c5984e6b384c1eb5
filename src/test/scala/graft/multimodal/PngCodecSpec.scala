package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PngCodec vs the JDK's own ImageIO: decoding PNGs written by an
  * INDEPENDENT encoder (ImageIO picks its own filters/compression) must
  * reproduce the source pixels exactly; and ImageIO must read back what
  * PngCodec.encode writes. */
class PngCodecSpec extends AnyFunSuite with Matchers {

  private def imageioPng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodes ImageIO-written RGB PNGs pixel-exactly (gradients trigger filters)") {
    val rng = new scala.util.Random(42)
    for ((w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 9))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        // half gradient (filter-friendly), half noise
        val (r, g, b) =
          if (x < w / 2) ((x * 8) % 256, (y * 16) % 256, (x + y) % 256)
          else (rng.nextInt(256), rng.nextInt(256), rng.nextInt(256))
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val decoded = PngCodec.decode(imageioPng(img))
      decoded should not be None
      val d = decoded.get
      d.width shouldBe w
      d.height shouldBe h
      d.channels shouldBe 3
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val base = (y * w + x) * 3
        (d.pixels(base) & 0xFF) shouldBe ((rgb >> 16) & 0xFF)
        (d.pixels(base + 1) & 0xFF) shouldBe ((rgb >> 8) & 0xFF)
        (d.pixels(base + 2) & 0xFF) shouldBe (rgb & 0xFF)
      }
    }
  }

  test("decodes ImageIO-written gray PNGs pixel-exactly") {
    val w = 19; val h = 11
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 13 + y * 7) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val d = PngCodec.decode(imageioPng(img)).get
    d.channels shouldBe 1
    for (y <- 0 until h; x <- 0 until w)
      (d.pixels(y * w + x) & 0xFF) shouldBe ((x * 13 + y * 7) % 256)
  }

  test("ImageIO reads back PngCodec.encode output exactly (gray and rgb)") {
    val rng = new scala.util.Random(7)
    val w = 12; val h = 9
    val gray = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
    val viaImageio = ImageIO.read(new java.io.ByteArrayInputStream(PngCodec.encode(w, h, 1, gray)))
    viaImageio.getWidth shouldBe w
    viaImageio.getHeight shouldBe h
    for (y <- 0 until h; x <- 0 until w)
      viaImageio.getRaster.getSample(x, y, 0) shouldBe (gray(y * w + x) & 0xFF)

    val rgb = Array.fill[Byte](w * h * 3)(rng.nextInt(256).toByte)
    val img2 = ImageIO.read(new java.io.ByteArrayInputStream(PngCodec.encode(w, h, 3, rgb)))
    for (y <- 0 until h; x <- 0 until w) {
      val p = img2.getRGB(x, y)
      ((p >> 16) & 0xFF) shouldBe (rgb((y * w + x) * 3) & 0xFF)
      ((p >> 8) & 0xFF) shouldBe (rgb((y * w + x) * 3 + 1) & 0xFF)
      (p & 0xFF) shouldBe (rgb((y * w + x) * 3 + 2) & 0xFF)
    }
  }

  test("round-trip: encode then decode is the identity") {
    val w = 21; val h = 5
    val px = Array.tabulate[Byte](w * h)(i => ((i * 37) % 256).toByte)
    val d = PngCodec.decode(PngCodec.encode(w, h, 1, px)).get
    d.pixels.toSeq shouldBe px.toSeq
  }

  test("honest None on unsupported variants and junk") {
    PngCodec.decode(null) shouldBe None
    PngCodec.decode(Array.fill[Byte](64)(0x41)) shouldBe None
    // truncated real png
    val full = PngCodec.encode(8, 8, 1, Array.fill[Byte](64)(3))
    PngCodec.decode(full.take(full.length / 2) ++ Array.fill[Byte](8)(0)) shouldBe None
  }
}
