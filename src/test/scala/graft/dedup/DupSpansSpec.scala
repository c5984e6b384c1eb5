package graft.dedup

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** Cross-document exact-substring duplication (Lee et al. 2021 suffix-array
  * dedup, relational formulation — Dedup.duplicateWindowStats / q92). */
class DupSpansSpec extends SparkSpec with Matchers {

  private def run(rows: Seq[(Long, String)], k: Int) = {
    import spark.implicits._
    Dedup.duplicateWindowStats(rows.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
  }

  test("shared k-word run is flagged in both docs, unique text is not") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ") // 6 shared words
    val a = s"a1 a2 a3 $shared a4"                       // 10 words
    val b = s"b1 $shared b2 b3 b4"                       // 10 words
    val c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"             // no overlap
    val out = run(Seq((0L, a), (1L, b), (2L, c)), k = 5)
    // doc 0: windows of 5 words = 6; those fully inside the shared run
    // are windows starting at s1 and s2 positions... both docs contain
    // the 2 five-word windows of the 6-word shared run
    out(0L)._1 shouldBe 6L
    out(1L)._1 shouldBe 6L
    out(2L)._1 shouldBe 6L
    out(0L)._2 shouldBe 2L
    out(1L)._2 shouldBe 2L
    out(2L)._2 shouldBe 0L
    out(2L)._3 shouldBe 0.0
    out(0L)._3 shouldBe (2.0 / 6.0 +- 1e-6)
  }

  test("exact copies are 100% duplicated; short docs get zero windows") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val out = run(Seq((0L, text), (1L, text), (2L, "tiny doc")), k = 10)
    out(0L) shouldBe ((3L, 3L, 1.0))
    out(1L) shouldBe ((3L, 3L, 1.0))
    out(2L) shouldBe ((0L, 0L, 0.0))
  }

  test("within-doc repetition alone does not count (cross-doc rule)") {
    val rep = Seq.fill(3)((1 to 5).map(i => s"r$i").mkString(" ")).mkString(" ")
    val out = run(Seq((0L, rep), (1L, "x1 x2 x3 x4 x5 x6")), k = 5)
    // doc 0 repeats its own 5-gram three times but no other doc has it
    out(0L)._2 shouldBe 0L
  }

  test("removeDuplicateSpans trims exactly the covered words") {
    import spark.implicits._
    val shared = (1 to 6).map(i => s"s$i").mkString(" ")
    val a = s"a1 a2 a3 $shared a4"
    val b = s"b1 $shared b2 b3 b4"
    val c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    val out = Dedup.removeDuplicateSpans(
      Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text"), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // doc 0's dup windows start at s1 and s2 (positions 4 and 5 of 10
    // words), covering words 4..9 -> keep a1 a2 a3 a4
    out(0L) shouldBe ((4L, "a1 a2 a3 a4"))
    // doc 1's dup windows start at positions 2 and 3, covering 2..7 ->
    // keep b1 b2 b3 b4
    out(1L) shouldBe ((4L, "b1 b2 b3 b4"))
    // untouched doc survives verbatim
    out(2L) shouldBe ((10L, c))
  }

  test("removeDuplicateSpans empties exact copies and keeps short docs") {
    import spark.implicits._
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val out = Dedup.removeDuplicateSpans(
      Seq((0L, text), (1L, text), (2L, "tiny doc")).toDF("doc_id", "text"), k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    out(0L) shouldBe ((0L, ""))
    out(1L) shouldBe ((0L, ""))
    out(2L) shouldBe ((2L, "tiny doc"))
  }

  test("multiple consecutive spaces do not create empty tokens") {
    val out = run(Seq((0L, "a  b   c d e f"), (1L, "a b c d e f")), k = 5)
    // identical token streams after empty-run filtering -> all windows dup
    out(0L) shouldBe out(1L)
    out(0L)._2 shouldBe 2L
  }
}
