package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.core.Trajectories

/** Sessionization + exact-quantile reporting ops. */
class SessionizeSpec extends SparkSpec with Matchers {

  test("sessionize splits on gaps strictly greater than the threshold") {
    import spark.implicits._
    val ev = Seq(
      // user 1: gaps 10, 100 (boundary: == gap stays), 101 (split)
      (1L, 0L, 1L, 1.0), (1L, 10L, 2L, 1.0), (1L, 110L, 3L, 1.0), (1L, 211L, 4L, 1.0),
      // user 2: single event
      (2L, 5L, 5L, 2.0)
    ).toDF("user_id", "tsu", "event_id", "value")
    val out = Trajectories.sessionize(ev, gapMicros = 100L)
      .select("user_id", "event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), // gap 100 == threshold: same session
      (1L, 4L, 2L),                             // gap 101 > threshold: new session
      (2L, 5L, 1L))
  }

  test("exactQuantiles picks the ceil(q*n)-ranked value") {
    import spark.implicits._
    val df = (1 to 10).map(_.toLong).toDF("v")
    val got = graft.util.Stats.exactQuantiles(df, "v", Seq(0.1, 0.25, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    got shouldBe Map(0.1 -> 1L, 0.25 -> 3L, 0.5 -> 5L, 1.0 -> 10L)
  }
}
