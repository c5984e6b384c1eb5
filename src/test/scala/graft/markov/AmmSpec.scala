package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import graft.data.MarkovSim
import org.scalatest.matchers.should.Matchers

/** Augmented MSM (reference tests/markov/msm/test_amm.py strategy: biasing
  * toward a measured observable shifts the stationary expectation toward
  * the measurement while staying a valid reversible MSM). */
class AmmSpec extends SparkSpec with Matchers {

  test("AMM pulls the stationary expectation toward the measurement") {
    val chain = MarkovSim.defaultBirthDeath
    // synthetic counts from the true chain (large, so MSM expectation is sharp)
    val n = chain.n
    val pi = chain.stationaryDistribution
    val counts = DenseMatrix.tabulate(n, n)((i, j) =>
      math.rint(10000 * pi(i) * chain.transitionMatrix(i, j)))
    // observable: state index; unbiased expectation:
    val e = DenseMatrix.tabulate(n, 1)((i, _) => i.toDouble)
    val unbiased = (0 until n).map(i => pi(i) * i).sum
    // measurement: push expectation up by 0.4; moderate weight (large
    // weights destabilize the constrained Newton iteration, as in the
    // reference implementation)
    val target = unbiased + 0.4
    val model = Amm.fit(counts, e, DenseVector(target), DenseVector(2.0))

    val msm = model.msm()
    msm.isTransitionMatrix(1e-8) shouldBe true
    // stationary distribution of the output equals the biased pi_hat
    val piOut = graft.linalg.LinAlg.stationaryDistribution(model.transitionMatrix)
    (0 until n).foreach(i => piOut(i) shouldBe model.stationaryDistribution(i) +- 1e-6)
    val biased = (0 until n).map(i => model.stationaryDistribution(i) * i).sum
    // moved toward the target without wild overshoot
    biased should be > unbiased + 0.02
    biased should be < target + 0.4
    // detailed balance holds w.r.t. pi_hat
    for (i <- 0 until n; j <- 0 until n)
      model.stationaryDistribution(i) * model.transitionMatrix(i, j) shouldBe
        model.stationaryDistribution(j) * model.transitionMatrix(j, i) +- 1e-6
  }

  test("zero-weight measurement reduces to the plain reversible MSM") {
    val chain = MarkovSim.defaultBirthDeath
    val n = chain.n
    val counts = DenseMatrix.tabulate(n, n)((i, j) =>
      math.rint(5000 * chain.stationaryDistribution(i) * chain.transitionMatrix(i, j)) + 1.0)
    val e = DenseMatrix.tabulate(n, 1)((i, _) => i.toDouble)
    val model = Amm.fit(counts, e, DenseVector(99.0), DenseVector(0.0))
    val plain = TransitionMatrixMle.reversible(counts)
    for (i <- 0 until n; j <- 0 until n)
      model.transitionMatrix(i, j) shouldBe plain(i, j) +- 0.02
  }
}
