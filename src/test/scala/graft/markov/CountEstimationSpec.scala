package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum}
import org.scalatest.funsuite.AnyFunSuite

/** Pins CountEstimation to the reference's doctest/test fixtures
  * (estimation/api.py doctests; tests/markov/tools/estimation/tests/
  * test_prior.py, test_likelihood.py; dense/covariance.py algebra). */
class CountEstimationSpec extends AnyFunSuite {

  private val cPrior = DenseMatrix(
    (4.0, 4.0, 0.0, 2.0),
    (4.0, 4.0, 1.0, 0.0),
    (0.0, 1.0, 4.0, 4.0),
    (0.0, 0.0, 4.0, 4.0))

  test("prior_neighbor: alpha exactly where c_ij + c_ji > 0 (test_prior fixture)") {
    val mask = DenseMatrix(
      (1.0, 1.0, 0.0, 1.0),
      (1.0, 1.0, 1.0, 0.0),
      (0.0, 1.0, 1.0, 1.0),
      (1.0, 0.0, 1.0, 1.0))
    assert(CountEstimation.priorNeighbor(cPrior) == mask * 0.001)
    assert(CountEstimation.priorNeighbor(cPrior, alpha = -0.5) == mask * -0.5)
  }

  test("prior_const: alpha everywhere") {
    assert(CountEstimation.priorConst(cPrior) ==
      DenseMatrix.fill(4, 4)(0.001))
    assert(CountEstimation.priorConst(cPrior, alpha = -0.5) ==
      DenseMatrix.fill(4, 4)(-0.5))
  }

  test("prior_rev: alpha on the upper triangle only") {
    val b = CountEstimation.priorRev(cPrior)
    for (i <- 0 until 4; j <- 0 until 4)
      assert(b(i, j) == (if (i <= j) -1.0 else 0.0))
  }

  test("log_likelihood matches the api.py doctest values") {
    val t = DenseMatrix(
      (0.9, 0.1, 0.0),
      (0.5, 0.0, 0.5),
      (0.0, 0.1, 0.9))
    val c1 = DenseMatrix((58.0, 7.0, 0.0), (6.0, 0.0, 4.0), (0.0, 3.0, 21.0))
    assert(math.abs(CountEstimation.logLikelihood(c1, t) - -38.2808034725) < 1e-9)
    val c2 = DenseMatrix((58.0, 20.0, 0.0), (6.0, 0.0, 4.0), (0.0, 3.0, 21.0))
    assert(math.abs(CountEstimation.logLikelihood(c2, t) - -68.2144096814) < 1e-9)
  }

  test("dirichlet covariance: rows sum to zero, diagonal matches Var(p_j)") {
    val alpha = DenseVector(3.0, 1.0, 5.0)
    val cov = CountEstimation.dirichletCovariance(alpha)
    val a0 = sum(alpha)
    for (j <- 0 until 3) {
      assert(math.abs(sum(cov(j, ::))) < 1e-15)
      val pj = alpha(j) / a0
      val varJ = pj * (1 - pj) / (a0 + 1.0)
      assert(math.abs(cov(j, j) - varJ) < 1e-15)
      for (l <- 0 until 3) assert(math.abs(cov(j, l) - cov(l, j)) < 1e-15)
    }
  }

  test("tmatrix_cov row block equals Dirichlet(c_row + 1) covariance") {
    val cov = CountEstimation.tmatrixCovRow(cPrior, 2)
    val direct = CountEstimation.dirichletCovariance(
      DenseVector(1.0, 2.0, 5.0, 5.0))
    assert(cov == direct)
  }

  test("error perturbation: constant sensitivity has zero variance; " +
       "rank-one sensitivity matches the explicit triple sum") {
    // f(T) = const => S = all-ones rows, and each row of cov sums to 0
    val sConst = DenseMatrix.fill(4, 4)(1.0)
    assert(math.abs(CountEstimation.errorPerturbation(cPrior, sConst)) < 1e-12)
    val s = DenseMatrix.tabulate(4, 4)((i, j) => (i + 1.0) * (j + 1.0) / 16.0)
    var expect = 0.0
    for (i <- 0 until 4) {
      val cov = CountEstimation.tmatrixCovRow(cPrior, i)
      for (j <- 0 until 4; l <- 0 until 4)
        expect += s(i, j) * cov(j, l) * s(i, l)
    }
    assert(math.abs(CountEstimation.errorPerturbation(cPrior, s) - expect) == 0.0)
    assert(expect > 0.0)
  }
}
