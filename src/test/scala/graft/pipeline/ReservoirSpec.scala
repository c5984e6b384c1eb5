package graft.pipeline

import graft.SparkSpec
import graft.text.Packing
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Weighted reservoir sampling (q155): integer-exact ES keys
  * (max-of-w-hashes == u^(1/w) in distribution), driver replay,
  * weight monotonicity. */
class ReservoirSpec extends SparkSpec with Matchers {

  private val P = 2147483647L
  private val M = 2654435761L % P
  private def h(id: Long, j: Long): Long =
    (((id % P) * 1000003L + j) % P * M + 101L) % P
  private def keyDriver(id: Long, w: Long): Long =
    (1L to math.max(w, 1L)).map(h(id, _)).max

  private def mkDocs(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "n_chars")
  }

  test("selection replays the driver-side ES key computation exactly") {
    val rows = (0L until 200L).map(i => (i, 20L + (i * 37L) % 400L))
    val got = Packing.weightedReservoir(mkDocs(rows), k = 25).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val expected = rows.map { case (id, w) => (id, keyDriver(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(25)
    got.toSeq shouldBe expected
  }

  test("weight monotonicity: heavy items dominate the sample") {
    // 200 weight-10 docs vs 20 weight-1000 docs: each heavy doc's key is
    // the max of 100x more uniforms, so the top-10 should be mostly heavy
    val rows = (0L until 200L).map((_, 10L)) ++
      (1000L until 1020L).map((_, 1000L))
    val top = Packing.weightedReservoir(mkDocs(rows), k = 10).collect()
      .map(_.getLong(0))
    top.count(_ >= 1000L) should be >= 7
  }

  test("zero/negative weights are clamped to one draw, not dropped") {
    val rows = Seq((1L, 0L), (2L, 5L), (3L, 1L))
    val got = Packing.weightedReservoir(mkDocs(rows), k = 3).collect()
    got.length shouldBe 3
    got.find(_.getLong(0) == 1L).get.getLong(2) shouldBe keyDriver(1L, 1L)
  }
}
