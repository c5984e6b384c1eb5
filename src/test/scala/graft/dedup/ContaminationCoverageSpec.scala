package graft.dedup

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** Contamination coverage: per-doc fraction of distinct shingles found in
  * the benchmark. */
class ContaminationCoverageSpec extends SparkSpec with Matchers {

  test("coverage is exact on planted full/partial/zero overlap") {
    import spark.implicits._
    val bench = Seq((100L, "abcdefghij")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "abcdefghij"),     // identical: full coverage
      (2L, "abcdefgXYZWV"),   // shares no full 8-gram? "abcdefgX" != any bench shingle -> 0
      (3L, "zabcdefghij")     // shares bench's 3 shingles out of its 4
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationCoverage(corpus, bench, shingleLen = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // bench "abcdefghij" has 3 distinct 8-grams: abcdefgh, bcdefghi, cdefghij
    out(1L) shouldBe ((3L, 3L, 1.0))
    out(2L)._2 shouldBe 0L
    out(2L)._3 shouldBe 0.0
    out(3L) shouldBe ((4L, 3L, 0.75))
  }

  test("docs shorter than the shingle length get zero totals, not dropped") {
    import spark.implicits._
    val bench = Seq((100L, "abcdefghij")).toDF("doc_id", "text")
    val corpus = Seq((1L, "short")).toDF("doc_id", "text")
    val out = Dedup.contaminationCoverage(corpus, bench, shingleLen = 8).collect()
    out should have size 1
    out(0).getLong(1) shouldBe 0L
    out(0).getDouble(3) shouldBe 0.0
  }
}
