package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** LOCF grid resample: slot-last selection, gap filling, span bounds. */
class ResampleSpec extends SparkSpec with Matchers {

  test("gaps fill forward, slot-last wins, grid spans min..max slots") {
    import spark.implicits._
    // step 10: key 1 observes in slots 0 (twice), 2; slot 1 is a gap
    val df = Seq(
      (1L, 3L, 1.0, 10L),   // slot 0, earlier
      (1L, 7L, 2.0, 11L),   // slot 0, later -> slot-last
      (1L, 25L, 5.0, 12L),  // slot 2
      (2L, 41L, 9.0, 13L)   // key 2: single obs, slot 4
    ).toDF("k", "ts", "v", "tie")
    val out = Resample.locfGrid(df, "k", "ts", "v", stepUs = 10L, tieCol = "tie")
      .orderBy("k", "slot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    out.toSeq shouldBe Seq(
      (1L, 0L, 0L, 2.0, 1),
      (1L, 1L, 10L, 2.0, 0), // gap: carried forward
      (1L, 2L, 20L, 5.0, 1),
      (2L, 4L, 40L, 9.0, 1))
  }

  test("equal-ts ties break by the tie column (max wins)") {
    import spark.implicits._
    val df = Seq(
      (1L, 5L, 1.0, 10L),
      (1L, 5L, 2.0, 11L)
    ).toDF("k", "ts", "v", "tie")
    val out = Resample.locfGrid(df, "k", "ts", "v", 10L, "tie").collect()
    out should have length 1
    out(0).getDouble(3) shouldBe 2.0
  }
}
