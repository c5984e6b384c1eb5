package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Co-located bucketed joins: same-bucketed tables join exchange-free and
  * produce the same rows as the shuffled join. */
class BucketingSpec extends SparkSpec with Matchers {

  test("bucketed fact-to-fact join runs without exchanges and matches the shuffle join") {
    import spark.implicits._
    val orders = (0L until 400L).map(k => (k, s"prio-${k % 5}")).toDF("okey", "prio")
    val lines = (0L until 2000L).map(i => (i % 400L, i, (i % 7).toDouble))
      .toDF("okey", "line_id", "amount")

    Bucketing.writeBucketed(orders, "orders_b", "okey", 8)
    Bucketing.writeBucketed(lines, "lines_b", "okey", 8)
    val ob = Bucketing.readTable(spark, "orders_b")
    val lb = Bucketing.readTable(spark, "lines_b")

    // AQE rewrites can hide/introduce exchanges lazily; disable broadcast
    // so the join is a genuine sort-merge over the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ob.join(lb, "okey")
      joined.count() shouldBe 2000L
      Bucketing.isExchangeFree(joined) shouldBe true

      val agg = joined.groupBy("prio").agg(sum("amount").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val expected = lines.join(orders, "okey").groupBy("prio")
        .agg(sum("amount").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      agg shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lines_b")
    }
  }
}
