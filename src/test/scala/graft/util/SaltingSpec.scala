package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Skew-mitigation shapes: two-phase distinct and salted join must equal
  * their plain counterparts exactly. */
class SaltingSpec extends SparkSpec with Matchers {

  test("skew-aware distinct count equals plain countDistinct on skewed data") {
    import spark.implicits._
    // hot key 0 carries 10k rows over 700 distinct values; cold keys tiny
    val rows = (0 until 10000).map(i => (0, (i % 700).toLong)) ++
      (0 until 50).map(i => (1, (i % 7).toLong)) ++ Seq((2, 42L))
    val df = rows.toDF("k", "v")
    val salted = Salting.skewAwareDistinctCount(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    salted shouldBe plain
    salted(0) shouldBe 700L
  }

  test("salted join equals the plain join under a hot key") {
    import spark.implicits._
    val probe = ((0 until 5000).map(i => (7L, i.toLong)) ++
      (0 until 100).map(i => (i.toLong % 5, 100000L + i))).toDF("key", "row_id")
    val build = (0L until 10L).map(k => (k, s"dim-$k")).toDF("key", "label")
    val (sp, sb) = Salting.saltJoinSides(probe, build, "key",
      buckets = 4, probeTieBreak = "row_id")
    val salted = sp.join(sb, Seq("key", "__salt"))
      .select("key", "row_id", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = probe.join(build, "key")
      .select("key", "row_id", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    salted shouldBe plain
  }
}
