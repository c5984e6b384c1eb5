package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec
import graft.similarity.Similarity
import graft.text.TextFunctions

/** Recall gates for the approximate near-dup / ANN paths against their
  * exact twins (VERDICT r02: approximate queries must be graded, not
  * just row-counted). Runs on the sf0.001 driver testdata. */
class DedupRecallSpec extends SparkSpec with Matchers {

  val dir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("exact dedup preserves null-text rows as one fingerprint group " +
    "(ADVICE r10: the aggregate join-back must be null-safe)") {
    import spark.implicits._
    val d = Seq((1L, Option("a b")), (2L, Option("a b")),
      (3L, Option.empty[String]), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Dedup.exact(d).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out.size shouldBe 4 // null-text rows NOT dropped
    out(1L) shouldBe true
    out(2L) shouldBe false
    out(3L) shouldBe true  // group minimum of the null-fingerprint group
    out(4L) shouldBe false
  }

  test("minhash banding recalls every pair with exact jaccard >= 0.6") {
    val ids = docs.select(col("doc_id"))
    val allPairs = ids.select(col("doc_id").as("a"))
      .crossJoin(ids.select(col("doc_id").as("b")))
      .where(col("a") < col("b"))
    val exact = Dedup.ngramJaccard(docs, allPairs, 5)
      .where(col("jaccard") >= 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty // the testdata plants near-dups
    val cand = Dedup.minhashCandidates(docs, bands = 8, rowsPerBand = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact -- cand) shouldBe empty // recall = 1.0 on the true pair set
  }

  test("simhash banding recall is exactly 1 within the pigeonhole bound (hamming <= 3)") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val exact = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        Dedup.hamming64(col("x.sig"), col("y.sig")).as("hamming"))
      .where(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.simhashCandidates(docs, maxHamming = 3)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cand shouldBe exact // banding guarantee: candidates == exact pair set
  }

  test("portable simhash banding == exact hamming<=3 join (60-bit, 4x15 bands)") {
    val sigs = docs.select(col("doc_id"), Dedup.simhashPortable(col("text")).as("sig"))
    val exact = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        Dedup.hamming64(col("x.sig"), col("y.sig")).as("hamming"))
      .where(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.simhashCandidatesPortable(docs, maxHamming = 3)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cand shouldBe exact
    // signatures use only the low 60 bits
    val maxSig = sigs.agg(max(col("sig"))).collect()(0).getLong(0)
    assert(maxSig >= 0L && maxSig < (1L << 60))
  }

  test("simhash over-cap buckets emit hub star edges from the nHubs " +
    "smallest ids (the r11 agg rework preserves the rk<=nHubs selection)") {
    import spark.implicits._
    // ten identical docs -> every band bucket holds all ten (over cap 3);
    // hubs = the 2 smallest ids; candidates = hub-to-member pairs only
    val d = (0L until 10L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashCandidates(d, maxBucketSize = 3, nHubs = 2)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      h <- Seq(0L, 1L); m <- 0L until 10L if h < m
    } yield (h, m)).toSet
    got shouldBe expected
  }

  test("wide-bucket LSH ANN reaches recall@5 >= 0.9 vs brute force") {
    val q = emb.where(col("vec_id") % 40 === 0)
    val brute = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, q, 5, dim = 64, nPlanes = 2, numTables = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    recall should be >= 0.9
  }

  test("IVF ANN with generous probes reaches recall@5 >= 0.8 vs brute force") {
    val q = emb.where(col("vec_id") % 40 === 0)
    val brute = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, q, k = 5, nCells = 8, nProbe = 5, seed = 42L)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    recall should be >= 0.8
  }

  test("sign-plane buckets: deterministic, in range, and UDF matches a scala replay") {
    val dim = 64; val nPlanes = 8; val numTables = 4
    val rows = emb.limit(20)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        Similarity.hyperplaneBuckets(col("embedding"), dim, nPlanes, numTables).as("b"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val b = r.getSeq[Long](2)
      b.length shouldBe numTables
      for (t <- 0 until numTables) {
        var expect = 0L
        for (p <- 0 until nPlanes) {
          var s = 0.0
          for (i <- 0 until dim)
            s += (if (Similarity.planeSign(42 + t, p, i) > 0) v(i) else -v(i))
          if (s >= 0) expect |= (1L << p)
        }
        b(t) shouldBe expect
        b(t) should be < (1L << nPlanes)
      }
    }
  }

  test("native minhash signature is bit-identical to the explode+groupBy formulation") {
    import org.apache.spark.sql.functions._
    val k = 12
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 5))).as("sh"))
    val base = sh.select(col("doc_id"),
      xxhash64(col("sh")).as("h1"), xxhash64(col("sh"), lit(1)).as("h2"))
    val mins = (0 until k).map { i =>
      val s = (i % 63) + 1
      val mix = lit(0x9E3779B97F4A7C15L * (2L * i + 1L))
      val rot = shiftleft(col("h2"), s).bitwiseOR(shiftrightunsigned(col("h2"), 64 - s))
      min(col("h1").bitwiseXOR(rot).bitwiseXOR(mix)).as(s"h$i")
    }
    val viaAgg = base.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    val viaExpr = Dedup.minhashSignatures(docs, "text", "doc_id", 5, k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    viaExpr shouldBe viaAgg
  }
}
