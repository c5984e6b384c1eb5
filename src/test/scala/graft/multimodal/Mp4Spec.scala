package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ISO-BMFF box walker + mvhd parse (video metadata leg). */
class Mp4Spec extends AnyFunSuite with Matchers {

  test("encodeMinimal round-trips through parse") {
    val bytes = Mp4.encodeMinimal("isom", 600L, 90000L)
    val m = Mp4.parse(bytes).get
    m.brand shouldBe "isom"
    m.timescale shouldBe 600L
    m.duration shouldBe 90000L
    m.nTopBoxes shouldBe 2 // ftyp + moov
  }

  test("parser walks unknown boxes and 64-bit sizes") {
    val base = Mp4.encodeMinimal("mp42", 1000L, 5000L)
    // prepend nothing, append an unknown box ('free') and verify parse
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++ Array[Byte](1, 2, 3, 4)
    val m = Mp4.parse(base ++ free).get
    m.brand shouldBe "mp42"
    m.timescale shouldBe 1000L
    m.nTopBoxes shouldBe 3
    // 64-bit largesize framing on a trailing box must not derail parsing
    val big = Array[Byte](0, 0, 0, 1) ++ "skip".getBytes ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 20) ++ Array.fill[Byte](4)(0)
    Mp4.parse(base ++ big).get.timescale shouldBe 1000L
  }

  test("non-BMFF payloads are rejected, malformed sizes terminate") {
    Mp4.parse("not a video at all".getBytes) shouldBe None
    Mp4.parse(Array[Byte](1, 2, 3)) shouldBe None
    // size-0 box (extends to EOF) after ftyp must terminate cleanly
    val ftyp = Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes ++
      "isom".getBytes ++ Array[Byte](0, 0, 0, 0)
    val zero = Array[Byte](0, 0, 0, 0) ++ "mdat".getBytes ++ Array.fill[Byte](8)(7)
    val m = Mp4.parse(ftyp ++ zero).get
    m.brand shouldBe "isom"
    m.nTopBoxes shouldBe 2
  }

  test("frame-sample schedule covers [0, duration] every k seconds") {
    Mp4.frameSampleTimestamps(600L, 90000L, 10L) shouldBe
      Seq(0L, 6000L, 12000L, 18000L, 24000L, 30000L, 36000L, 42000L,
        48000L, 54000L, 60000L, 66000L, 72000L, 78000L, 84000L, 90000L)
    Mp4.frameSampleTimestamps(0L, 100L, 10L) shouldBe Seq.empty
    Mp4.frameSampleTimestamps(600L, 0L, 10L) shouldBe Seq.empty
  }

  test("hostile container metadata cannot blow up the schedule") {
    // u32-max duration at timescale 1 (a malicious mvhd) would naively
    // materialize 4.3e9 Longs and OOM the executor; the schedule is
    // clamped to maxSamples
    val sched = Mp4.frameSampleTimestamps(1L, 4294967295L, 1L)
    sched.length shouldBe 604800
    // a smaller explicit cap clamps likewise and keeps the stride
    val small = Mp4.frameSampleTimestamps(1L, 4294967295L, 1L, maxSamples = 100)
    small.length shouldBe 100
    small.take(3) shouldBe Seq(0L, 1L, 2L)
  }
}
