package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Property test: PngCodec.encode/decode round trip is the identity for
  * arbitrary gray and RGB images across sizes (ScalaCheck over random
  * dimensions and pixel contents). */
object PngCodecPropertySpec extends Properties("PngCodec") {

  private val dims = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
  } yield (w, h)

  property("gray round trip") = Prop.forAll(dims, Gen.long) { case ((w, h), seed) =>
    val rng = new scala.util.Random(seed)
    val px = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
    val d = PngCodec.decode(PngCodec.encode(w, h, 1, px))
    d.exists(r => r.width == w && r.height == h && r.channels == 1 &&
      java.util.Arrays.equals(r.pixels, px))
  }

  property("rgb round trip") = Prop.forAll(dims, Gen.long) { case ((w, h), seed) =>
    val rng = new scala.util.Random(seed)
    val px = Array.fill[Byte](w * h * 3)(rng.nextInt(256).toByte)
    val d = PngCodec.decode(PngCodec.encode(w, h, 3, px))
    d.exists(r => r.width == w && r.height == h && r.channels == 3 &&
      java.util.Arrays.equals(r.pixels, px))
  }

  property("decode never fabricates on random junk") = Prop.forAll(
    Gen.choose(0, 200).flatMap(n => Gen.listOfN(n, Gen.choose(0, 255)))) { bytes =>
    PngCodec.decode(bytes.map(_.toByte).toArray).isEmpty
  }
}
