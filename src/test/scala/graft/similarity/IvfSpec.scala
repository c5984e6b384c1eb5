package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** IVF ANN: recall against brute force on clustered embeddings. */
class IvfSpec extends SparkSpec with Matchers {

  def clusteredEmbeddings(n: Int, d: Int, nClusters: Int, seed: Long) = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(seed)
    val centers = Array.fill(nClusters, d)(rng.nextGaussian() * 3)
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.indices.map(j => c(j) + 0.3 * rng.nextGaussian()))
    }.toDF("vec_id", "embedding")
  }

  test("ivf top-k has high recall vs brute force and touches fewer rows") {
    val corpus = clusteredEmbeddings(2000, 16, 8, seed = 5L).cache()
    val queries = corpus.where(col("vec_id") % 100 === 0)
    val k = 5
    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(corpus, queries, k, nCells = 8, nProbe = 3, seed = 11L)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be > 0.9
    // per-query ranks are 1..k with deterministic structure
    val ranks = Similarity.ivfTopK(corpus, queries, k, nCells = 8, nProbe = 3, seed = 11L)
      .groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("maxr"))
      .collect()
    ranks.foreach { r =>
      r.getLong(1) shouldBe k.toLong
      r.getInt(2) shouldBe k
    }
  }
}
