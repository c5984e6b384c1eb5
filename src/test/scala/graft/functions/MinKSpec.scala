package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** MinKLongAgg: the bounded k-smallest aggregate that replaces the
  * bucket rank window in minhashCandidates / cosineNearDupes. */
class MinKSpec extends SparkSpec with Matchers {

  private def brute(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy("g")
    .agg(slice(sort_array(collect_list(col("v"))), 1, k).as("expect"))

  test("matches sort-collect-slice on multi-partition data (partial merges forced)") {
    import spark.implicits._
    // deterministic, skewed: group 0 holds 10k rows, others a handful;
    // 64 partitions force many partial buffers per group
    val rows = (0 until 10000).map(i => (0L, (i * 2654435761L) % 100000)) ++
      (1 to 50).flatMap(g => (0 until g % 7 + 1).map(i => (g.toLong, (g * 31 + i * 17).toLong)))
    val df = rows.toDF("g", "v").repartition(64)
    for (k <- Seq(1, 3, 8)) {
      val got = df.groupBy("g").agg(MinK.minKLong(col("v"), k).as("got"))
      val joined = got.join(brute(df, k), "g")
        .where(col("got") =!= col("expect"))
      joined.count() shouldBe 0L
    }
  }

  test("groups smaller than k return all values sorted; duplicates kept") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L, 2L), (2L, 7L), (2L, 7L), (2L, 7L), (3L, 9L))
      .toDF("g", "v").repartition(4)
    val out = df.groupBy("g").agg(MinK.minKLong(col("v"), 4).as("m"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    out(1L) shouldBe Seq(2L, 5L)
    out(2L) shouldBe Seq(7L, 7L, 7L)
    out(3L) shouldBe Seq(9L)
  }

  test("candidate parity: reworked minhashCandidates equals a window-rank replay") {
    import spark.implicits._
    // force the over-cap star regime with a tiny cap on planted near-dups
    val boiler = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = (0L until 40L).map(i => (i, boiler + s" tail$i"))
      .toDF("doc_id", "text")
    val cand = graft.dedup.Dedup.minhashCandidates(docs,
        maxBucketSize = 8, nHubs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // replay with the old window-rank formulation inline
    val banded = graft.dedup.Dedup.lshBands(docs, "text", "doc_id", 5, 6, 5)
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_hash")
    val b = banded.withColumn("bucket_n", count(lit(1)).over(bw))
      .withColumn("rk", row_number().over(bw.orderBy(col("doc_id"))))
    val small = b.where(col("bucket_n") <= 8)
    val pairs = small.select(col("band_idx"), col("band_hash"), col("doc_id").as("a"))
      .join(small.select(col("band_idx"), col("band_hash"), col("doc_id").as("b")),
        Seq("band_idx", "band_hash")).where(col("a") < col("b")).select("a", "b")
    val over = b.where(col("bucket_n") > 8)
    val stars = over.where(col("rk") <= 3)
      .select(col("band_idx"), col("band_hash"), col("doc_id").as("a"))
      .join(over.select(col("band_idx"), col("band_hash"), col("doc_id").as("b")),
        Seq("band_idx", "band_hash")).where(col("a") < col("b")).select("a", "b")
    val expect = pairs.union(stars).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    cand shouldBe expect
    cand.nonEmpty shouldBe true
  }
}
