package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests: the ISO-BMFF encoder/parser round trip is the identity
  * for arbitrary brands/timescales/durations, and the parser never throws
  * on arbitrary byte junk (robust ingest contract for a 100 TB corpus of
  * untrusted binaries). */
object Mp4PropertySpec extends Properties("Mp4") {

  private val brandGen = Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString)
  private val u32Gen = Gen.choose(0L, 0xFFFFFFFFL)

  property("encode/parse round trip") =
    Prop.forAll(brandGen, u32Gen, u32Gen) { (brand, ts, dur) =>
      val m = Mp4.parse(Mp4.encodeMinimal(brand, ts, dur)).get
      m.brand == brand && m.timescale == ts && m.duration == dur && m.nTopBoxes == 2
    }

  property("parser never throws on junk bytes") =
    Prop.forAll(Gen.choose(0, 64), Gen.long) { (n, seed) =>
      val rng = new scala.util.Random(seed)
      val bytes = Array.fill[Byte](n)(rng.nextInt(256).toByte)
      Mp4.parse(bytes) // must not throw; result may be None or garbage-brand
      true
    }

  property("parser never throws on truncated valid files") =
    Prop.forAll(u32Gen, Gen.choose(0, 140)) { (dur, cut) =>
      val full = Mp4.encodeMinimal("isom", 600L, dur)
      Mp4.parse(full.take(math.min(cut, full.length)))
      true
    }

  property("sample schedule is within [0, duration] and sorted") =
    Prop.forAll(Gen.choose(1L, 100000L), Gen.choose(1L, 10000000L),
      Gen.choose(1L, 100L)) { (ts, dur, every) =>
      val sched = Mp4.frameSampleTimestamps(ts, dur, every)
      sched.forall(t => t >= 0 && t <= dur) &&
        sched.sliding(2).forall { case Seq(a, b) => a < b; case _ => true }
    }
}
