package graft.markov

import breeze.linalg.{DenseMatrix, sum => bsum}
import graft.SparkSpec
import graft.data.MarkovSim
import org.scalatest.matchers.should.Matchers

/** Effective counts + Bayesian MSM posterior (reference
  * tests/markov/msm/test_bayesian_msm.py strategy: posterior concentrates
  * around truth on simulated data; effective counts <= sliding counts). */
class BayesianSpec extends SparkSpec with Matchers {

  lazy val chain = MarkovSim.defaultBirthDeath
  lazy val dtraj = MarkovSim.simulate(spark, chain.transitionMatrix,
    nTraj = 6, length = 2500, seed = 13L).cache()

  test("effective counts: bounded by sliding counts, preserve row structure") {
    val c = TransitionCounting.toDense(
      TransitionCounting.slidingCounts(dtraj, 1), chain.n)
    val ceff = EffectiveCounts.effectiveCountMatrix(dtraj, 1, chain.n)
    for (i <- 0 until chain.n; j <- 0 until chain.n) {
      ceff(i, j) should be <= c(i, j) + 1e-9
      if (c(i, j) == 0) ceff(i, j) shouldBe 0.0
      else ceff(i, j) should be > 0.0
    }
    // row scaling: ratios within a row are preserved
    for (i <- 0 until chain.n) {
      val nz = (0 until chain.n).filter(j => c(i, j) > 0)
      if (nz.length > 1) {
        val r0 = ceff(i, nz.head) / c(i, nz.head)
        nz.foreach(j => ceff(i, j) / c(i, j) shouldBe r0 +- 1e-9)
      }
    }
  }

  test("statistical inefficiency near 1 at lag 1 for a true Markov chain") {
    // at tau=1 consecutive conditional targets of a Markov chain are nearly
    // independent draws => I_ij close to 1
    val si = EffectiveCounts.statisticalInefficiencies(dtraj, 1, chain.n)
    val c = TransitionCounting.toDense(
      TransitionCounting.slidingCounts(dtraj, 1), chain.n)
    for (i <- 0 until chain.n; j <- 0 until chain.n if c(i, j) > 50) {
      si(i, j) should be > 0.5
      si(i, j) should be <= 1.0
    }
  }

  test("effective counts: unequal-length trajectories — count matrix " +
      "equals sliding counts, inefficiencies stay in (0, 1]") {
    // r18 pin for the bounded-collect rewrite (VERDICT r17 item 2): the
    // (s0,y) histogram and the per-s0 max sequence length are now
    // aggregated distributed; unequal per-trajectory lengths exercise
    // the max-over-trajectories path specifically.
    import org.apache.spark.sql.functions.col
    val longTraj = MarkovSim.simulate(spark, chain.transitionMatrix,
      nTraj = 2, length = 1200, seed = 17L)
    val shortTraj = MarkovSim.simulate(spark, chain.transitionMatrix,
      nTraj = 2, length = 300, seed = 19L)
      .withColumn("traj_id", col("traj_id") + 2L)
    val mixed = longTraj.union(shortTraj).cache()
    val (si, c) = EffectiveCounts.inefficienciesAndCounts(mixed, 1, chain.n)
    val cSliding = TransitionCounting.toDense(
      TransitionCounting.slidingCounts(mixed, 1), chain.n)
    for (i <- 0 until chain.n; j <- 0 until chain.n) {
      c(i, j) shouldBe cSliding(i, j) // exact integer identity
      if (c(i, j) > 0) {
        si(i, j) should be > 0.0
        si(i, j) should be <= 1.0
      } else si(i, j) shouldBe 0.0
    }
  }

  test("nonreversible sampler: Dirichlet rows are stochastic, mean near MLE") {
    val c = DenseMatrix((90.0, 10.0), (20.0, 80.0))
    val rng = new java.util.SplittableRandom(5L)
    val samples = Seq.fill(400)(TmatrixSampler.sampleNonReversible(c, rng))
    samples.foreach { t =>
      bsum(t(0, ::).t) shouldBe 1.0 +- 1e-12
      bsum(t(1, ::).t) shouldBe 1.0 +- 1e-12
    }
    val mean01 = samples.map(_(0, 1)).sum / samples.size
    // Dirichlet mean = alpha/alpha0 = 10/100
    mean01 shouldBe 0.1 +- 0.01
  }

  test("reversible sampler: samples satisfy detailed balance and concentrate") {
    val c = DenseMatrix((300.0, 40.0, 2.0), (45.0, 500.0, 30.0), (1.0, 35.0, 200.0))
    val samples = TmatrixSampler.sampleReversible(c, nSamples = 80, seed = 17L)
    samples.foreach { t =>
      val msm = MarkovStateModel(t)
      msm.isTransitionMatrix(1e-8) shouldBe true
      msm.isReversible(1e-6) shouldBe true
    }
    val mle = TransitionMatrixMle.reversible(c)
    val mean01 = samples.map(_(0, 1)).sum / samples.size
    mean01 shouldBe mle(0, 1) +- 0.05
  }

  test("fixed-pi sampler: samples are stochastic, reversible w.r.t. the constrained pi, and concentrate near the fixed-pi MLE") {
    import breeze.linalg.DenseVector
    val c = DenseMatrix((300.0, 40.0, 2.0), (45.0, 500.0, 30.0), (1.0, 35.0, 200.0))
    val pi = DenseVector(0.35, 0.45, 0.20)
    val samples = TmatrixSampler.sampleReversibleFixedPi(c, pi, nSamples = 80, seed = 17L)
    samples.foreach { t =>
      val msm = MarkovStateModel(t)
      msm.isTransitionMatrix(1e-8) shouldBe true
      // detailed balance w.r.t. the CONSTRAINED pi, not the empirical one
      for (i <- 0 until 3; j <- 0 until 3)
        pi(i) * t(i, j) shouldBe pi(j) * t(j, i) +- 1e-10
      // pi is exactly stationary for every sample
      for (j <- 0 until 3)
        (0 until 3).map(i => pi(i) * t(i, j)).sum shouldBe pi(j) +- 1e-10
    }
    // genuine stochasticity: consecutive samples differ
    val distinct = samples.sliding(2).count { case Seq(a, b) =>
      (0 until 3).exists(i => (0 until 3).exists(j => a(i, j) != b(i, j))) }
    distinct shouldBe 79
    val mle = MsmAnalysis.reversibleMleFixedPi(c, pi)
    for (i <- 0 until 3; j <- 0 until 3) {
      val mean = samples.map(_(i, j)).sum / samples.size
      mean shouldBe mle(i, j) +- 0.06
    }
  }

  test("fixed-pi sampler: zero-diagonal counts get the regularized P0 + diagonal prior") {
    import breeze.linalg.DenseVector
    // state 1 never self-transitions in the data
    val c = DenseMatrix((50.0, 10.0), (12.0, 0.0))
    val pi = DenseVector(0.7, 0.3)
    val samples = TmatrixSampler.sampleReversibleFixedPi(c, pi, nSamples = 40, seed = 3L)
    samples.foreach { t =>
      MarkovStateModel(t).isTransitionMatrix(1e-8) shouldBe true
      for (i <- 0 until 2; j <- 0 until 2)
        pi(i) * t(i, j) shouldBe pi(j) * t(j, i) +- 1e-10
    }
  }

  test("BayesianMsm.fit with piConstraint: prior is the fixed-pi MLE, every posterior sample holds pi") {
    val piFull = Array(0.1, 0.15, 0.5, 0.15, 0.1)
    val post = BayesianMsm.fit(dtraj, tau = 1, nStates = chain.n,
      nSamples = 40, seed = 23L, nChains = 4, piConstraint = Some(piFull))
    post.samples.size shouldBe 40
    val n = post.prior.n
    val piSub = {
      val restricted = post.prior.states.map(piFull(_))
      val z = restricted.sum
      restricted.map(_ / z)
    }
    // prior == fixed-pi MLE on the same restricted counts
    val priorT = post.prior.transitionMatrix
    for (i <- 0 until n; j <- 0 until n)
      piSub(i) * priorT(i, j) shouldBe piSub(j) * priorT(j, i) +- 1e-8
    post.samples.foreach { msm =>
      msm.isTransitionMatrix(1e-8) shouldBe true
      val t = msm.transitionMatrix
      for (i <- 0 until n; j <- 0 until n)
        piSub(i) * t(i, j) shouldBe piSub(j) * t(j, i) +- 1e-10
    }
  }

  test("bayesian msm posterior covers the true timescale") {
    val post = BayesianMsm.fit(dtraj, tau = 1, nStates = chain.n,
      nSamples = 60, seed = 23L, nChains = 4)
    post.samples.size shouldBe 60
    val trueT1 = MarkovStateModel(chain.transitionMatrix).timescales(1).head
    val Seq((_, mean, std, lo, hi)) = post.timescaleStats(1)
    std should be > 0.0
    // truth inside a generous CI band
    (trueT1 > lo * 0.7 && trueT1 < hi * 1.3) shouldBe true
    math.abs(mean - trueT1) / trueT1 should be < 0.35
  }
}
