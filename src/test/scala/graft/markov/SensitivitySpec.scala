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

  test("eigenvector sensitivity matches finite differences (right and left)") {
    val k = 1; val j = 2
    def evEntry(m: DenseMatrix[Double], right: Boolean): Double = {
      val mm = if (right) m else m.t
      val e = breeze.linalg.eig(mm)
      val perm = (0 until n).sortBy(i => -e.eigenvalues(i))
      var v = DenseVector.tabulate(n)(i => e.eigenvectors(i, perm(k)))
      v = v / breeze.linalg.norm(v)
      // fix sign: align with a reference direction (largest-|.| entry positive)
      val pivot = (0 until n).maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v = -v
      v(j)
    }
    for (right <- Seq(true, false)) {
      // sign-align the analytic sensitivity with the same pivot convention:
      // evEntry is smooth in T near t (pivot stable under small eps)
      val s = Sensitivity.eigenvectorSensitivity(t, k, j, right)
      // determine whether our eig's v_k matches the pivot-positive convention
      val mm = if (right) t else t.t
      val e = breeze.linalg.eig(mm)
      val perm = (0 until n).sortBy(i => -e.eigenvalues(i))
      var v = DenseVector.tabulate(n)(i => e.eigenvectors(i, perm(k)))
      v = v / breeze.linalg.norm(v)
      val pivot = (0 until n).maxBy(i => math.abs(v(i)))
      val flip = if (v(pivot) < 0) -1.0 else 1.0
      val expected = flip * (s(1, 2) - s(1, 1))
      fd(evEntry(_, right), 1, 2, 1, eps = 1e-6) shouldBe expected +- 1e-4
    }
  }

  test("eigenvector sensitivity preserves the unit norm algebraically") {
    // ||v_k|| = 1 for every T (LAPACK dgeev convention), so the derivative
    // of the norm vanishes: sum_j v_j * d(v_j)/dT_ab == 0 exactly — an
    // algebraic identity of the adjoint solve, not a finite difference
    val k = 1
    val e = breeze.linalg.eig(t)
    val perm = (0 until n).sortBy(i => -e.eigenvalues(i))
    val v = DenseVector.tabulate(n)(i => e.eigenvectors(i, perm(k)))
    val sens = (0 until n).map(j => Sensitivity.eigenvectorSensitivity(t, k, j))
    val resid = (for (a <- 0 until n; b <- 0 until n) yield
      math.abs((0 until n).map(j => v(j) * sens(j)(a, b)).sum)).max
    resid should be < 1e-9
  }

  test("2-state pi sensitivity matches the (a,b) closed form") {
    // free-perturbation derivative of pi_0 for T = [[1-a, a], [b, 1-b]]:
    // dpi0/dT = [[ab, -b^2], [a^2, -ab]] / (a+b)^3 (eigenvalue-corrected
    // left-eigenvector derivative; the q254 second-regime SQL twin
    // replays these values)
    val (a, b) = (0.3, 0.2)
    val t2 = DenseMatrix((1 - a, a), (b, 1 - b))
    val s = Sensitivity.stationaryDistributionSensitivity(t2, 0)
    val d3 = math.pow(a + b, 3)
    s(0, 0) shouldBe a * b / d3 +- 1e-10
    s(0, 1) shouldBe -b * b / d3 +- 1e-10
    s(1, 0) shouldBe a * a / d3 +- 1e-10
    s(1, 1) shouldBe -a * b / d3 +- 1e-10
  }

  test("3-state eigenvalue sensitivity matches the adjugate closed form") {
    // dlambda2/dT_kl = l_k r_l / (l . r) with r any nonzero column and l
    // any nonzero row of adj(T - lambda2 I); lambda2 from the quadratic
    // x^2 - (e1 - 1) x + (e2 - e1 + 1) = 0 (e1 = trace, e2 = sum of
    // principal 2x2 minors). This is the independent replay the q254
    // second-regime SQL twin computes.
    val t3 = DenseMatrix(
      (0.80, 0.15, 0.05),
      (0.10, 0.70, 0.20),
      (0.06, 0.24, 0.70))
    val e1 = t3(0, 0) + t3(1, 1) + t3(2, 2)
    val e2 = (t3(0, 0) * t3(1, 1) - t3(0, 1) * t3(1, 0)) +
      (t3(0, 0) * t3(2, 2) - t3(0, 2) * t3(2, 0)) +
      (t3(1, 1) * t3(2, 2) - t3(1, 2) * t3(2, 1))
    val disc = (e1 - 1) * (e1 - 1) - 4 * (e2 - e1 + 1)
    disc should be > 0.0
    val lam2 = ((e1 - 1) + math.sqrt(disc)) / 2
    // adjugate of M = T - lam2 I
    val m = t3 - DenseMatrix.eye[Double](3) * lam2
    def cof(i: Int, j: Int): Double = {
      val (r1, r2) = ((0 to 2).filter(_ != i), (0 to 2).filter(_ != j))
      val sgn = if ((i + j) % 2 == 0) 1.0 else -1.0
      sgn * (m(r1(0), r2(0)) * m(r1(1), r2(1)) - m(r1(0), r2(1)) * m(r1(1), r2(0)))
    }
    val adj = DenseMatrix.tabulate(3, 3)((i, j) => cof(j, i)) // adj = cof'
    // r = column 0 of adj, l = row 0 of adj (both in lambda2's eigenspace)
    val r = adj(::, 0)
    val l = adj(0, ::).t
    val lr = l dot r
    math.abs(lr) should be > 1e-12
    val s = Sensitivity.eigenvalueSensitivity(t3, 1)
    for (i <- 0 until 3; j <- 0 until 3)
      s(i, j) shouldBe l(i) * r(j) / lr +- 1e-9
  }
}
