package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** cosineNearDupes over-cap bucket policy: a dense near-identical clique
  * larger than maxBucketSize must stay CONNECTED through hub star edges
  * (pre-round-9 the whole bucket was dropped — the densest duplicate
  * group was exactly the one that vanished), while candidate count stays
  * linear in the clique size rather than quadratic. */
class CosineNearDupSpec extends SparkSpec with Matchers {

  test("over-cap sign-LSH bucket degrades to hub star edges, not to nothing") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(7L)
    val d = 16
    val base = Array.fill(d)(rng.nextGaussian())
    // 40-member near-identical clique (all pairwise cosine ~1) + 30
    // scattered background vectors
    // perturbation tiny relative to any plane projection so the whole
    // clique deterministically lands in ONE sign bucket
    val clique = (0L until 40L).map(i =>
      (i, base.toIndexedSeq.map(v => v + 1e-9 * rng.nextGaussian())))
    val noise = (100L until 130L).map(i =>
      (i, IndexedSeq.fill(d)(rng.nextGaussian())))
    val corpus = (clique ++ noise).toDF("vec_id", "embedding")

    val nHubs = 2
    val pairs = Similarity.cosineNearDupes(corpus, threshold = 0.95, dim = d,
      nPlanes = 4, numTables = 1, maxBucketSize = 10, nHubs = nHubs)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))

    // every clique member is reachable: ids 0..nHubs-1 are the hubs, so
    // each member >= nHubs appears in some (hub, member) verified pair
    val cliqueIds = (0L until 40L).toSet
    val touched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    (cliqueIds -- touched) shouldBe empty
    // linear, not quadratic: star edges give <= nHubs * |clique| pairs
    // per table (plus background), nothing near the 780-pair all-pairs
    val cliquePairs = pairs.count(p => cliqueIds(p._1) && cliqueIds(p._2))
    cliquePairs should be <= (nHubs * 40)
    // and the verify still rejects non-duplicates: no clique-noise pair
    pairs.exists(p => cliqueIds(p._1) ^ cliqueIds(p._2)) shouldBe false
  }

  test("buckets at or under the cap keep the exact all-pairs guarantee") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(11L)
    val d = 16
    val base = Array.fill(d)(rng.nextGaussian())
    val clique = (0L until 5L).map(i =>
      (i, base.toIndexedSeq.map(v => v + 0.001 * rng.nextGaussian())))
    val corpus = clique.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupes(corpus, threshold = 0.95, dim = d,
      nPlanes = 2, numTables = 2, maxBucketSize = 100)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should have size 10 // all 5*4/2 pairs verified directly
  }
}
