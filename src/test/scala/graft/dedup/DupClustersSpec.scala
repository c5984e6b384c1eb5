package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-components labeling over near-dup pairs (Dedup.duplicateClusters):
  * the min-label propagation must converge to the component-minimum id. */
class DupClustersSpec extends SparkSpec {

  test("labels chains, triangles and singleton-free isolation correctly (both paths)") {
    import spark.implicits._
    // components: {1,2,3,4} (a path, diameter 3), {10,11,12} (triangle),
    // {20,21} (pair); 30 appears in no pair -> not labeled
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("a", "b")
    val expect = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
    // driver union-find fallback (default threshold)
    val gotDriver = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDriver == expect)
    // distributed min-label propagation (threshold 0 forces the loop)
    val gotDist = Dedup.duplicateClusters(pairs, driverEdgeThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist == expect)
  }

  test("over-cap band buckets degrade to star edges, not silence") {
    import spark.implicits._
    // 8 identical docs share every band bucket; with maxBucketSize=3 the
    // all-pairs join is skipped but star edges must keep the duplicate
    // cluster connected (previously the whole bucket was dropped)
    val docs = (0L until 8L).map(i => (i, "the quick brown fox jumps over the lazy dog repeatedly"))
      .toDF("doc_id", "text")
    val cand = Dedup.minhashCandidates(docs, maxBucketSize = 3)
    val clusters = Dedup.duplicateClusters(cand.select("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.keySet == (0L until 8L).toSet)
    assert(clusters.values.toSet == Set(0L)) // one cluster, canonical = min id
    // candidate count stays linear in bucket size (<= nHubs * n edges from
    // the 3 hubs {0,1,2}: 7+6+5 = 18), not quadratic (28 all-pairs)
    assert(cand.count() <= 18L)
    // single-hub fallback is the strict star
    assert(Dedup.minhashCandidates(docs, maxBucketSize = 3, nHubs = 1).count() <= 7L)
  }

  test("simhash over-cap buckets degrade to hub edges, not a quadratic join") {
    import spark.implicits._
    // 10 identical docs -> identical signatures -> hamming 0 everywhere;
    // with maxBucketSize=4 the all-pairs join must be replaced by hub
    // edges that still connect every doc (r04 simhash had NO cap — a
    // boilerplate bucket went quadratic)
    val docs = (0L until 10L).map(i => (i, "same boilerplate text body for every doc here"))
      .toDF("doc_id", "text")
    for (fn <- Seq(
      Dedup.simhashCandidates(docs, maxHamming = 3, maxBucketSize = 4, nHubs = 2),
      Dedup.simhashCandidatesPortable(docs, maxHamming = 3, maxBucketSize = 4, nHubs = 2))) {
      val cand = fn.select("a", "b")
      // linear: hubs {0,1} -> 9+8 = 17 edges max, vs 45 all-pairs
      assert(cand.count() <= 17L)
      val clusters = Dedup.duplicateClusters(cand)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(clusters.keySet == (0L until 10L).toSet)
      assert(clusters.values.toSet == Set(0L))
    }
  }

  test("long path converges within the diameter bound (distributed loop)") {
    import spark.implicits._
    // path 0-1-2-...-9: diameter 9 < maxIter default 20
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.duplicateClusters(pairs, driverEdgeThreshold = 0L).collect()
    assert(got.length == 10)
    assert(got.forall(_.getLong(1) == 0L))
  }
}
