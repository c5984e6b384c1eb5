package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Blocked edit-distance fuzzy join (q153): sound length blocking
  * (recall 1 vs brute force), banded verify values, cap behavior. */
class EditDistanceSpec extends SparkSpec with Matchers {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // deterministic word-salad with planted near-identical pairs whose
  // lengths intentionally straddle bucket boundaries
  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val docs = mkDocs(Seq(
    (0L, base),
    (1L, base + " x"),                       // dist 2, adjacent length
    (2L, base.replace("quick", "quack")),    // dist 1, same length
    (3L, base.replace("brown fox", "green cat")), // dist ~6
    (4L, "completely different content entirely unrelated to anything"),
    (5L, base + " xyzzy plugh extra words appended beyond the threshold"),
    (6L, "short text"),
    (7L, "short tixt"),                      // dist 1 with 6
    (8L, "a" * 26),                          // bucket boundary probes:
    (9L, "a" * 27),                          // len 26 vs 27 cross 27/9=3
    (10L, "a" * 35)))                        // 27 vs 35 dist 8, buckets 3|3

  private def brute(maxDist: Int): Set[(Long, Long, Long)] = {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      d = levDriver(ta, tb) if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet
  }

  // reference Levenshtein, driver-side
  private def levDriver(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("editDistanceJoin matches brute force exactly (recall 1 incl. cross-bucket pairs)") {
    for (t <- Seq(2, 8)) {
      val got = Dedup.editDistanceJoin(docs, maxDist = t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got shouldBe brute(t)
    }
  }

  test("adjacent-bucket pair with larger-id longer doc is found (orientation regression)") {
    // ids chosen so the longer doc has the LARGER id — the r05-style
    // a<b filter on the raw join orientation dropped exactly this case
    val d = mkDocs(Seq((1L, "b" * 17), (2L, "b" * 19)))
    val got = Dedup.editDistanceJoin(d, maxDist = 8).collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe
      Set((1L, 2L, 2L))
  }

  test("candidate set is exactly the |Δlen| <= maxDist universe when caps do not fire") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1).length))
    val expected = (for {
      (ia, la) <- rows; (ib, lb) <- rows
      if ia < ib && math.abs(la - lb) <= 8
    } yield (ia, ib)).toSet
    val got = Dedup.lengthBucketCandidates(docs, maxDist = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe expected
  }

  test("over-cap buckets degrade to the bounded sorted-neighborhood sweep") {
    // 6 same-length docs (one bucket of 6, over cap 4) + a pair elsewhere.
    // With snmWindow=2 each over-cap member pairs with its next 2
    // (simhash, id)-rank neighbors: candidates <= 6*2, NOT 15 all-pairs —
    // and the exact small-bucket pair still comes through untouched.
    val d = mkDocs((0L to 5L).map(i => (i, "c" * 20)) ++
      Seq((10L, "d" * 40), (11L, "d" * 41)))
    val cands = Dedup.lengthBucketCandidates(d, maxDist = 8,
      maxBucketSize = 4, snmWindow = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical texts share a simhash, so rank order in the c-bucket is
    // the id tie-break; window 2 pairs (i, i+1/i+2)
    val expectedSnm = (0L to 5L).flatMap(i =>
      Seq(i -> (i + 1), i -> (i + 2))).filter(_._2 <= 5L).toSet
    cands shouldBe (expectedSnm + (10L -> 11L))
    // the verify stage then reports all surviving exact distances
    val got = Dedup.editDistanceJoin(d, maxDist = 8, maxBucketSize = 4,
      snmWindow = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe cands // all c-dups are dist 0, the d-pair dist 1
  }

  test("two-pass range-partitioned SNM rank is candidate-identical to the " +
    "single-window shape on a diverse over-cap band") {
    // 400 docs in ONE length band (content varies, so simhash rank order
    // is content-driven and rows genuinely spread across several range
    // partitions), plus a second over-cap band and an under-cap exact
    // band. Reference = the pre-r11 formulation: one row_number window
    // partitioned by bkt alone.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{functions => F} // Matchers shadows `length`
    val rnd = new scala.util.Random(17)
    def word() = ("abcdefghij" (rnd.nextInt(10))).toString * (1 + rnd.nextInt(3))
    val band1 = (0L until 400L).map(i =>
      (i, (0 until 7).map(_ => word()).mkString(" ").padTo(60, 'x')))
    val band2 = (1000L until 1200L).map(i =>
      (i, (0 until 9).map(_ => word()).mkString(" ").padTo(90, 'y')))
    val small = Seq((5000L, "z" * 200), (5001L, "z" * 201))
    val d = mkDocs(band1 ++ band2 ++ small)
    val got = Dedup.lengthBucketCandidates(d, maxDist = 8,
      maxBucketSize = 64, snmWindow = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: identical pipeline with the legacy single-window rank
    val w = maxOf(8) // width = maxDist + 1
    val base = d.select(col("doc_id").as("id"),
      (F.length(col("text")) / w).cast("long").as("bkt"),
      F.length(col("text")).as("len"),
      Dedup.simhash(col("text")).as("sig"))
    val sized = base.join(
      base.groupBy("bkt").agg(count(lit(1)).as("bucket_n")), "bkt")
    val capped = sized.where(col("bucket_n") <= 64).drop("bucket_n")
    val l = capped.select(col("id").as("a"), col("bkt"), col("len").as("la"))
    val r = capped.select(col("id").as("b"), col("bkt"), col("len").as("lb"))
      .union(capped.select(col("id").as("b"), (col("bkt") + 1).as("bkt"),
        col("len").as("lb")))
    val exact = l.join(r, Seq("bkt"))
      .where(col("a") =!= col("b") && abs(col("la") - col("lb")) <= 8)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
    val over = sized.where(col("bucket_n") > 64)
    val ow = Window.partitionBy("bkt").orderBy(col("sig"), col("id"))
    val ranked = over.withColumn("rnk", row_number().over(ow).cast("long"))
    val snm = ranked.select(col("bkt"), col("id").as("a"), col("len").as("la"),
        explode(sequence(col("rnk") + 1, col("rnk") + 5)).as("rnk2"))
      .join(ranked.select(col("bkt"), col("rnk").as("rnk2"),
        col("id").as("b"), col("len").as("lb")), Seq("bkt", "rnk2"))
      .where(abs(col("la") - col("lb")) <= 8)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
    val ref = exact.union(snm).distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    got shouldBe ref
    got.size should be > 400 // the snm sweep actually fired
  }

  private def maxOf(maxDist: Int): Int = maxDist + 1

  test("banded verify reports the exact distance and drops above-threshold pairs") {
    val d = mkDocs(Seq((0L, "abcdef"), (1L, "abXdef"), (2L, "ghijkl")))
    import spark.implicits._
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("a", "b")
    val got = Dedup.editDistanceVerify(d, pairs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set((0L, 1L, 1L))
  }
}
