package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Rate-matrix estimators vs the reference test fixture
  * (tests/markov/tools/estimation/tests/test_ratematrix.py): a 3-state
  * generator with rates spanning 3 orders of magnitude, observed at
  * lag tau=0.001 with ~1M aggregated counts, must be recovered by both
  * KL and CVE to 0.5% relative accuracy. */
class RateMatrixSpec extends AnyFunSuite with Matchers {

  // fixture: K, T = expm(tau K), pi, C = ceil(pi_i T_ij t_agg)
  val tau = 0.001
  val kTrue: DenseMatrix[Double] = DenseMatrix(
    (-1.0, 1.0, 0.0),
    (100.0, -1100.0, 1000.0),
    (0.0, 5.0, -5.0))
  val n = 3

  // stationary distribution of K: detailed balance pi_i K_ij = pi_j K_ji
  // along the birth-death chain 0-1-2
  val pi: DenseVector[Double] = {
    val p = Array(1.0, 1.0 / 100.0, 1000.0 / (100.0 * 5.0) / 1.0)
    // pi_1/pi_0 = K01/K10 = 1/100; pi_2/pi_1 = K12/K21 = 1000/5
    val raw = Array(1.0, 1.0 / 100.0, (1.0 / 100.0) * (1000.0 / 5.0))
    val s = raw.sum
    DenseVector(raw.map(_ / s))
  }

  val tMat: DenseMatrix[Double] = RateMatrix.expmRev(kTrue, pi, tau)
  val tAgg = 1000000.0
  val cMat: DenseMatrix[Double] = DenseMatrix.tabulate(n, n)((i, j) =>
    math.ceil(pi(i) * tMat(i, j) * tAgg))
  // tridiagonal connectivity pattern (the reference's C0)
  val sparsity: DenseMatrix[Double] = {
    val s = DenseMatrix.zeros[Double](n, n)
    s(0, 1) = 1; s(1, 0) = 1; s(1, 2) = 1; s(2, 1) = 1
    s
  }

  private def relErr(a: DenseMatrix[Double], b: DenseMatrix[Double]): Double =
    (for (i <- 0 until n; j <- 0 until n if math.abs(b(i, j)) > 1e-12)
      yield math.abs(a(i, j) - b(i, j)) / math.abs(b(i, j))).max

  test("expmRev: T is a transition matrix consistent with K") {
    (0 until n).foreach(i => bsum(tMat(i, ::).t) shouldBe 1.0 +- 1e-12)
    tMat.forall(_ >= 0) shouldBe true
    // generator consistency: (T - I)/tau -> K as tau -> 0 (first order)
    val kApprox = (tMat - DenseMatrix.eye[Double](n)) / tau
    relErr(kApprox, kTrue) should be < 0.6 // first-order error at this tau
  }

  test("KL estimator recovers K (reference test_Kalbfleisch_Lawless_with_connectivity)") {
    val kEst = RateMatrix.kl(cMat, kTrue, pi, dt = tau,
      sparsity = Some(sparsity), tAgg = tAgg * tau, tol = 100.0)
    relErr(kEst, kTrue) should be < 5e-3
  }

  test("CVE estimator recovers K (reference test_Crommelin_Vanden_Eijnden_with_connectivity)") {
    val kEst = RateMatrix.cve(tMat, kTrue, pi, dt = tau,
      sparsity = Some(sparsity), tAgg = tAgg * tau, tol = 100.0)
    relErr(kEst, kTrue) should be < 5e-3
  }

  test("dispatcher: KL from counts alone (pseudo -> CVE -> KL chain) recovers K") {
    val kEst = RateMatrix.estimate(cMat, dt = tau, method = "KL",
      sparsity = Some(sparsity), tAgg = tAgg * tau, piOpt = Some(pi), tol = 100.0)
    relErr(kEst, kTrue) should be < 5e-3
  }

  test("dispatcher: without pi and without sparsity (api_without_connectivity_without_pi)") {
    val kEst = RateMatrix.estimate(cMat, dt = tau, method = "KL", tol = 100.0)
    for (i <- 0 until n; j <- 0 until n)
      kEst(i, j) shouldBe kTrue(i, j) +- (5e-3 * math.abs(kTrue(i, j)) + 1e-3 * 1100)
    RateMatrix.isRateMatrix(kEst) shouldBe true
  }

  test("pseudo and truncated_log produce valid generators") {
    val kP = RateMatrix.estimate(cMat, dt = tau, method = "pseudo")
    val kT = RateMatrix.estimate(cMat, dt = tau, method = "truncated_log")
    RateMatrix.isRateMatrix(kP, tol = 1e-9) shouldBe true
    RateMatrix.isRateMatrix(kT, tol = 1e-9) shouldBe true
  }

  test("is_rate_matrix predicate (tools/analysis/_api.py:45)") {
    RateMatrix.isRateMatrix(kTrue) shouldBe true
    RateMatrix.isRateMatrix(DenseMatrix((-1.0, 0.5), (1.0, -1.0))) shouldBe false // rows don't sum to 0
    RateMatrix.isRateMatrix(DenseMatrix((1.0, -1.0), (1.0, -1.0))) shouldBe false // negative off-diagonal
  }
}
