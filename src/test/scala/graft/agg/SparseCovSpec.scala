package graft.agg

import breeze.linalg.DenseMatrix
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Constant-column sparsification + nonrev RDL + sqrt model fixture. */
class SparseCovSpec extends SparkSpec with Matchers {

  test("sparse covariance path equals the dense path, constants zeroed") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(3L)
    val df = (0 until 500).map { i =>
      (i.toLong, 0L, Seq(rng.nextGaussian(), 7.0, 2.0 * rng.nextGaussian(), -1.5))
    }.toDF("traj_id", "t", "features")
    val dense = Covariance.fitFeatures(df)
    val sparse = Covariance.fitFeaturesSparse(df, 4)
    sparse.count shouldBe dense.count
    (0 until 4).foreach(i => sparse.mean0(i) shouldBe dense.mean0(i) +- 1e-9)
    for (i <- 0 until 4; j <- 0 until 4)
      sparse.cov00(i * 4 + j) shouldBe dense.cov00(i * 4 + j) +- 1e-9
    // constant dims exactly zero covariance
    (0 until 4).foreach { j =>
      sparse.cov00(1 * 4 + j) shouldBe 0.0
      sparse.cov00(3 * 4 + j) shouldBe 0.0
    }
  }

  test("fitByKey: per-group covariances equal per-filter fits") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(9L)
    val pairs = (0 until 800).map { i =>
      (i.toLong % 3, Seq(rng.nextGaussian(), rng.nextGaussian()),
        Seq(rng.nextGaussian(), rng.nextGaussian()))
    }.toDF("k", "x", "y").cache()
    val grouped = Covariance.fitByKey(pairs, "k")
    grouped.keySet shouldBe Set(0L, 1L, 2L)
    (0L to 2L).foreach { key =>
      val direct = Covariance.fit(pairs.where(col("k") === key).select(col("x"), col("y")))
      grouped(key).count shouldBe direct.count
      grouped(key).cov0t.zip(direct.cov0t).foreach { case (a, b) => a shouldBe b +- 1e-12 }
    }
  }

  test("sparse covariance degenerate cases: all-constant and empty input") {
    import spark.implicits._
    val allConst = (0 until 100).map(i => (i.toLong, 0L, Seq(2.0, -1.0)))
      .toDF("traj_id", "t", "features")
    val m = Covariance.fitFeaturesSparse(allConst, 2)
    m.count shouldBe 100
    m.weight shouldBe 100.0 +- 1e-12
    m.mean0.toSeq shouldBe Seq(2.0, -1.0)
    m.cov00.foreach(_ shouldBe 0.0)
    val empty = allConst.where(col("traj_id") < 0)
    val me = Covariance.fitFeaturesSparse(empty, 2)
    me.count shouldBe 0
  }

  test("nonrev RDL: LR = I, reconstructs T, first pair is (1, pi)") {
    // non-reversible 3-state matrix with a real spectrum
    val t = DenseMatrix((0.7, 0.2, 0.1), (0.05, 0.9, 0.05), (0.1, 0.3, 0.6))
    val (r, vals, l) = graft.markov.MsmAnalysis.rdlNonReversible(t)
    val lr = l * r
    breeze.linalg.max(breeze.numerics.abs(lr - DenseMatrix.eye[Double](3))) should be < 1e-9
    val recon = DenseMatrix.tabulate(3, 3)((i, j) =>
      (0 until 3).map(m => r(i, m) * vals(m) * l(m, j)).sum)
    breeze.linalg.max(breeze.numerics.abs(recon - t)) should be < 1e-9
    val pi = graft.linalg.LinAlg.stationaryDistribution(t)
    (0 until 3).foreach { i =>
      l(0, i) shouldBe pi(i) +- 1e-9
      r(i, 0) shouldBe 1.0 +- 1e-9
    }
  }

  test("sqrt model: nonlinearly separable metastable states recovered by gaussian hmm on y") {
    val df = graft.data.ExampleData.sqrtModel(spark, nTraj = 4, length = 1500, seed = 7L).cache()
    df.count() shouldBe 6000
    // raw y is NOT separable by sign alone (sqrt mask shifts it up)
    val meanY = df.agg(avg(expr("features[1]"))).collect()(0).getDouble(0)
    meanY should be > 0.5
    // lazy chain: self-transition ~0.95
    val counts = graft.markov.TransitionCounting.slidingCounts(
      df.select("traj_id", "t", "state"), 1)
    val msm = graft.markov.Msm.fromCounts(counts, 2, 1)
    msm.transitionMatrix(0, 0) shouldBe 0.95 +- 0.02
  }

  test("subtractModel: complement equals direct fit, including ill-centered data") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // mean >> std (condition ~1e6): the raw-moment subtraction formulation
    // differences near-equal ~w*mean^2 terms; centered-at-total-mean
    // reconstruction keeps full accuracy. (At even more extreme centering,
    // mean/std ~ 1e6, the ONE-PASS aggregator's own finish term w*m*m
    // dominates the error budget for every model — the reference's answer
    // is the same: scale features to O(1), as Trajectories.fromLineitem
    // does deliberately.)
    val rows = (0 until 4000).map { i =>
      val flag = i % 3 == 0
      (flag,
        Seq(1.0e3 + rng.nextGaussian(), -5.0e2 + 2.0 * rng.nextGaussian()),
        Seq(1.0e3 + rng.nextGaussian(), -5.0e2 + 2.0 * rng.nextGaussian()))
    }
    val df = rows.toDF("flag", "x", "y").cache()
    val total = Covariance.fit(df.select(col("x"), col("y")))
    val part = Covariance.fit(df.where(col("flag")).select(col("x"), col("y")))
    val direct = Covariance.fit(df.where(!col("flag")).select(col("x"), col("y")))
    val sub = Covariance.subtractModel(total, part)
    sub.count shouldBe direct.count
    sub.weight shouldBe direct.weight +- 1e-9
    for (i <- 0 until 2) {
      sub.mean0(i) shouldBe direct.mean0(i) +- 1e-6
      sub.meant(i) shouldBe direct.meant(i) +- 1e-6
    }
    for (k <- 0 until 4) {
      // covariances are O(1)-O(4); demand absolute accuracy ~1e-6 even
      // though the means are O(1e6)
      sub.cov00(k) shouldBe direct.cov00(k) +- 1e-6
      sub.cov0t(k) shouldBe direct.cov0t(k) +- 1e-6
      sub.covtt(k) shouldBe direct.covtt(k) +- 1e-6
    }
    df.unpersist()
  }
}
