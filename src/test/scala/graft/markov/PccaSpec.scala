package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** PCCA+ with refinement optimization (reference
  * tests/markov/tools/analysis/test_pcca.py strategy: block matrices give
  * crisp memberships; rows form a probability simplex; coarse matrix is
  * stochastic and metastable). */
class PccaSpec extends SparkSpec with Matchers {

  def model(p: DenseMatrix[Double]): MarkovStateModel = MarkovStateModel(p)

  test("two-block chain: crisp memberships, stochastic coarse matrix") {
    val p = DenseMatrix(
      (0.9, 0.08, 0.01, 0.01),
      (0.1, 0.88, 0.01, 0.01),
      (0.01, 0.01, 0.93, 0.05),
      (0.01, 0.01, 0.08, 0.9))
    for (i <- 0 until 4) p(i, ::) :/= bsum(p(i, ::).t)
    val pcca = Pcca(model(p), 2)
    // rows on the simplex
    (0 until 4).foreach { i =>
      bsum(pcca.memberships(i, ::).t) shouldBe 1.0 +- 1e-9
      (0 until 2).foreach { k => pcca.memberships(i, k) should be >= 0.0 }
    }
    // blocks {0,1} and {2,3} crisp after refinement
    pcca.assignments(0) shouldBe pcca.assignments(1)
    pcca.assignments(2) shouldBe pcca.assignments(3)
    pcca.assignments(0) should not be pcca.assignments(2)
    (0 until 4).foreach { i =>
      pcca.memberships(i, pcca.assignments(i)) should be > 0.9
    }
    // coarse T stochastic + strongly metastable
    (0 until 2).foreach { k =>
      bsum(pcca.coarseT(k, ::).t) shouldBe 1.0 +- 1e-8
      pcca.coarseT(k, k) should be > 0.9
    }
    bsum(pcca.coarsePi) shouldBe 1.0 +- 1e-9
  }

  test("refinement does not decrease the Roeblitz objective vs ISA") {
    val rnd = new scala.util.Random(11)
    // reversible 6-state matrix with 3 loose blocks
    val c = DenseMatrix.tabulate(6, 6) { (i, j) =>
      val bi = i / 2; val bj = j / 2
      (if (bi == bj) 60.0 else 2.0) + rnd.nextInt(5)
    }
    val t = TransitionMatrixMle.reversible(c + c.t)
    val msm = model(t)
    val m = 3
    val pi = msm.stationaryDistribution
    val sqrtPi = pi.map(math.sqrt)
    val sym = DenseMatrix.tabulate(6, 6)((i, j) => sqrtPi(i) * t(i, j) / sqrtPi(j))
    val es = breeze.linalg.eigSym((sym + sym.t) / 2.0)
    val order = (0 until 6).sortBy(i => -es.eigenvalues(i))
    val evecs = DenseMatrix.zeros[Double](6, m)
    for (k <- 0 until m; i <- 0 until 6) evecs(i, k) = es.eigenvectors(i, order(k)) / sqrtPi(i)
    for (k <- 0 until m) {
      val nrm = math.sqrt((0 until 6).map(i => evecs(i, k) * evecs(i, k) * pi(i)).sum)
      evecs(::, k) :/= nrm
    }
    if (evecs(0, 0) < 0) evecs :*= -1.0 // only affects col 0 sign check below
    for (i <- 0 until 6) evecs(i, 0) = math.abs(evecs(i, 0))

    def score(rot: DenseMatrix[Double]): Double = {
      var s = 0.0
      for (i <- 0 until m; j <- 0 until m) s += rot(j, i) * rot(j, i) / rot(0, i)
      s
    }
    val (_, rot0) = Pcca.innerSimplex(evecs, m)
    val rotOpt = Pcca.optSoft(evecs, rot0, m)
    // feasible comparison point: ISA rotation refilled through the same
    // feasibility projection
    val rot0Feasible = Pcca.fillMatrix(rot0(1 until m, 1 until m).copy, evecs)
    score(rotOpt) should be >= score(rot0Feasible) - 1e-9
  }

  test("nelder-mead minimizes a quadratic") {
    val x0 = DenseVector(3.0, -2.0)
    val xOpt = Pcca.nelderMead(v => (v(0) - 1) * (v(0) - 1) + (v(1) + 2) * (v(1) + 2),
      x0, maxIter = 500)
    xOpt(0) shouldBe 1.0 +- 1e-3
    xOpt(1) shouldBe -2.0 +- 1e-3
  }
}
