package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** D4-style prototypicality pruning: per-cell ceil-rule drop counts,
  * rank correctness, determinism. */
class ProtoPruneSpec extends SparkSpec with Matchers {

  def clusteredEmbeddings(n: Int, d: Int, nClusters: Int, seed: Long) = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(seed)
    val centers = Array.fill(nClusters, d)(rng.nextGaussian() * 3)
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.indices.map(j => c(j) + 0.3 * rng.nextGaussian()))
    }.toDF("vec_id", "embedding")
  }

  test("per-cell drop counts follow the ceil rule and ranks are honest") {
    val corpus = clusteredEmbeddings(600, 8, 4, seed = 3L).cache()
    val out = Similarity.prototypicalityPrune(corpus, dropFrac = 0.3,
      nClusters = 4, seed = 7L).cache()
    out.count() shouldBe 600
    val cells = out.groupBy("cell").agg(
      count(lit(1)).as("n"),
      sum(when(col("keep") === 0, 1L).otherwise(0L)).as("dropped"),
      max(when(col("keep") === 1, col("proto"))).as("max_kept"),
      min(when(col("keep") === 0, col("proto"))).as("min_dropped")).collect()
    cells.foreach { r => // row: (cell, n, dropped, max_kept, min_dropped)
      r.getLong(2) shouldBe math.ceil(r.getLong(1) * 0.3).toLong
      // every dropped vector is at least as prototypical as every kept one
      if (!r.isNullAt(3) && !r.isNullAt(4))
        r.getDouble(4) should be >= r.getDouble(3) - 1e-12
    }
  }

  test("dropFrac 0 keeps everything") {
    val corpus = clusteredEmbeddings(200, 8, 2, seed = 5L)
    val out = Similarity.prototypicalityPrune(corpus, dropFrac = 0.0,
      nClusters = 2, seed = 7L)
    out.where(col("keep") === 0).count() shouldBe 0
  }

  test("deterministic for a fixed seed") {
    val corpus = clusteredEmbeddings(300, 8, 3, seed = 9L).cache()
    def run() = Similarity.prototypicalityPrune(corpus, dropFrac = 0.25,
      nClusters = 3, seed = 11L)
      .collect().map(r => (r.getLong(0), r.getInt(3))).sortBy(_._1).toSeq
    run() shouldBe run()
  }
}
