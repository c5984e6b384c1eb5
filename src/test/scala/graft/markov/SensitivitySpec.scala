package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkSpec
import graft.data.MarkovSim
import org.scalatest.matchers.should.Matchers

/** Sensitivities verified against central finite differences of the
  * quantity under a row-preserving perturbation (reference
  * tests/markov/tools/analysis test strategy). */
class SensitivitySpec extends SparkSpec with Matchers {

  val t: DenseMatrix[Double] = MarkovSim.defaultBirthDeath.transitionMatrix
  val n: Int = t.rows

  /** Directional derivative by central difference along a perturbation dT
    * that keeps rows stochastic (adds eps to (i,j), removes from (i,i)). */
  def fd(f: DenseMatrix[Double] => Double, i: Int, j: Int, jj: Int,
         eps: Double = 1e-7): Double = {
    val tp = t.copy; tp(i, j) += eps; tp(i, jj) -= eps
    val tm = t.copy; tm(i, j) -= eps; tm(i, jj) += eps
    (f(tp) - f(tm)) / (2 * eps)
  }

  test("eigenvalue sensitivity matches finite differences") {
    val k = 1
    val s = Sensitivity.eigenvalueSensitivity(t, k)
    def lambda1(m: DenseMatrix[Double]): Double = {
      val e = breeze.linalg.eig(m)
      (0 until n).map(e.eigenvalues(_)).sorted(Ordering[Double].reverse)(k)
    }
    // directional derivative along e_{(1,2)} - e_{(1,1)}
    val expected = s(1, 2) - s(1, 1)
    fd(lambda1, 1, 2, 1) shouldBe expected +- 1e-5
  }

  test("stationary distribution sensitivity matches finite differences") {
    val j = 0
    val s = Sensitivity.stationaryDistributionSensitivity(t, j)
    def piJ(m: DenseMatrix[Double]): Double =
      graft.linalg.LinAlg.stationaryDistribution(m)(j)
    val expected = s(2, 3) - s(2, 2)
    fd(piJ, 2, 3, 2) shouldBe expected +- 1e-5
  }

  test("mfpt sensitivity matches finite differences") {
    val target = n - 1
    val j = 0
    val s = Sensitivity.mfptSensitivity(t, target, j)
    def mfptJ(m: DenseMatrix[Double]): Double =
      MarkovStateModel(m).mfpt(Set(target))(j)
    val expected = s(1, 0) - s(1, 1)
    fd(mfptJ, 1, 0, 1) shouldBe expected +- 1e-3
  }

  test("forward committor sensitivity matches finite differences") {
    val a = Set(0); val b = Set(n - 1)
    val idx = 2
    val s = Sensitivity.forwardCommittorSensitivity(t, a, b, idx)
    def qIdx(m: DenseMatrix[Double]): Double =
      MarkovStateModel(m).committorForward(a, b)(idx)
    val expected = s(2, 3) - s(2, 2)
    fd(qIdx, 2, 3, 2) shouldBe expected +- 1e-5
  }

  test("expectation sensitivity is the observable-weighted pi sensitivity") {
    val obs = DenseVector.tabulate(n)(i => i.toDouble)
    val s = Sensitivity.expectationSensitivity(t, obs)
    def expectation(m: DenseMatrix[Double]): Double = {
      val pi = graft.linalg.LinAlg.stationaryDistribution(m)
      (0 until n).map(i => pi(i) * obs(i)).sum
    }
    val expected = s(1, 2) - s(1, 1)
    fd(expectation, 1, 2, 1) shouldBe expected +- 1e-5
  }
}
