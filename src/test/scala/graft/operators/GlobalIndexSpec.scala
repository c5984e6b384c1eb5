package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Distributed global ordered index: equals the single-partition
  * row_number without ever funneling the data through one task. */
class GlobalIndexSpec extends SparkSpec with Matchers {

  test("index equals the total-order rank on shuffled multi-partition input") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(5L)
    val rows = (0 until 5000).map(i => (i.toLong, rng.nextLong(1000))).toSeq
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(3))
      .shuffle(rows).toDF("id", "key").repartition(8)
    val out = GlobalIndex.withGlobalIndex(df, "pos", col("key"), col("id"))
      .select("pos", "id", "key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 5000
    val want = rows.sortBy(r => (r._2, r._1))
    out.sortBy(_._1).zipWithIndex.foreach { case ((pos, id, key), i) =>
      pos shouldBe i.toLong
      (id, key) shouldBe want(i)
    }
  }

  test("deterministic across runs") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i * 37 % 100).toLong))
      .toDF("id", "key").repartition(4)
    def run() = GlobalIndex.withGlobalIndex(df, "pos", col("key"), col("id"))
      .select("pos", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    run() shouldBe run()
  }
}
