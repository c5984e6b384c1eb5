package graft.pipeline

import graft.SparkSpec
import graft.agg.Whitening
import graft.text.TextFunctions
import graft.util.Stats
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Regression tests for round-1 review findings: degenerate shingles,
  * wide-feature whitening codegen, distributed bootstrap. */
class FixesSpec extends SparkSpec with Matchers {

  test("shingles of short documents are empty, not degenerate") {
    import spark.implicits._
    val df = Seq("ab", "", "abcdef").toDF("text")
    val out = df.select(TextFunctions.shingles(col("text"), 5).as("s"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq.empty
    out(1) shouldBe Seq.empty
    out(2) shouldBe Seq("abcde", "bcdef")
  }

  test("word shingles of short documents are empty and do not throw") {
    import spark.implicits._
    val df = Seq("one two", "one two three four").toDF("text")
    val out = df.select(TextFunctions.wordShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq.empty
    out(1) shouldBe Seq("one two three", "two three four")
  }

  test("whitening at d=128 compiles in bounded time and whitens") {
    import spark.implicits._
    val d = 128
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map { i =>
      (0L, i.toLong, Array.fill(d)(rnd.nextGaussian() * 3.0 + 1.0))
    }
    val traj = rows.toDF("traj_id", "t", "features")
    val t0 = System.nanoTime()
    val m = Whitening.fit(traj)
    val out = m.transform(traj)
    out.count() shouldBe 400
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    // the unrolled-expression path took unbounded codegen time at this
    // width; the gemv-UDF path must stay well under a minute end-to-end
    elapsedSec should be < 60.0
    // whitened covariance ~ identity on the diagonal
    val cov = graft.agg.Covariance.fitFeatures(out.select(col("traj_id"),
      col("t"), col("whitened").as("features")))
    cov.cov00(0) shouldBe 1.0 +- 0.2
    cov.cov00(d + 1) shouldBe 1.0 +- 0.2
  }

  test("bootstrap resample is seeded, deterministic, and collect-free") {
    import spark.implicits._
    val traj = (0 until 50).flatMap(id => (0 until 4).map(t =>
      (id.toLong, t.toLong, id * 100.0 + t))).toDF("traj_id", "t", "value")
    val b1 = Stats.bootstrapTrajectories(traj, seed = 7L)
    val b2 = Stats.bootstrapTrajectories(traj, seed = 7L)
    val b3 = Stats.bootstrapTrajectories(traj, seed = 8L)
    // same number of resampled trajectories as source ids
    b1.select("traj_id").distinct().count() shouldBe 50
    // every trajectory keeps its full length
    b1.groupBy("traj_id").count().select("count").as[Long].collect()
      .foreach(_ shouldBe 4L)
    // deterministic per seed
    val h1 = b1.orderBy("traj_id", "t").collect().toSeq
    val h2 = b2.orderBy("traj_id", "t").collect().toSeq
    h1 shouldBe h2
    // a different seed draws a different sample
    val h3 = b3.orderBy("traj_id", "t").collect().toSeq
    h1 should not be h3
    // the at-scale indexer branch (GlobalIndex two-pass past the window
    // threshold — r14: previously the branch claimed draw-parity in a
    // comment but no test forced it) draws the IDENTICAL sample: both
    // paths assign idx by ascending id
    val bBig = Stats.bootstrapTrajectories(traj, seed = 7L,
      windowIndexThreshold = 0L)
    bBig.orderBy("traj_id", "t").collect().toSeq shouldBe h1
  }
}
