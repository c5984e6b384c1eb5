package graft.operators

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** CDC latest-wins fold: insert/update/delete precedence. */
class ChangelogSpec extends SparkSpec with Matchers {

  test("updates replace, deletes drop, untouched keys survive") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val changes = Seq(
      (1L, 11L, 1L, "U"),   // update k=1
      (2L, 0L, 1L, "D"),    // delete k=2
      (4L, 40L, 1L, "I"),   // late insert of a new key
      (4L, 41L, 2L, "U")    // then update it
    ).toDF("k", "v", "seq", "op")
    val out = Changelog.applyLatestWins(base, changes, "k", "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 11L, 3L -> 30L, 4L -> 41L)
  }

  test("a delete followed by a re-insert at a later seq resurrects the key") {
    import spark.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val changes = Seq(
      (1L, 0L, 1L, "D"),
      (1L, 99L, 2L, "I")
    ).toDF("k", "v", "seq", "op")
    val out = Changelog.applyLatestWins(base, changes, "k", "seq", "op").collect()
    out should have length 1
    out(0).getLong(1) shouldBe 99L
  }
}
