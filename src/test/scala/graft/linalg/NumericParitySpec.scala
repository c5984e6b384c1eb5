package graft.linalg

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-side numeric surface parity (reference deeptime.numeric:
  * schatten_norm, predicates, ksum/kdot, logsumexp). */
class NumericParitySpec extends AnyFunSuite with Matchers {

  test("schatten norms: p=1 trace norm, p=2 frobenius, diag closed form") {
    val d = DenseMatrix((3.0, 0.0), (0.0, 4.0))
    LinAlg.schattenNorm(d, 1.0) shouldBe 7.0 +- 1e-12
    LinAlg.schattenNorm(d, 2.0) shouldBe 5.0 +- 1e-12
    val m = DenseMatrix((1.0, 2.0), (0.5, -1.0))
    val fro = math.sqrt(m.toArray.map(x => x * x).sum)
    LinAlg.schattenNorm(m, 2.0) shouldBe fro +- 1e-12
  }

  test("predicates: square, diagonal, sorted, connected") {
    LinAlg.isSquare(DenseMatrix.zeros[Double](2, 3)) shouldBe false
    LinAlg.isDiagonal(DenseMatrix((1.0, 0.0), (0.0, 2.0))) shouldBe true
    LinAlg.isDiagonal(DenseMatrix((1.0, 0.1), (0.0, 2.0))) shouldBe false
    LinAlg.isSorted(Seq(1.0, 2.0, 2.0)) shouldBe true
    LinAlg.isSorted(Seq(3.0, 2.0), descending = true) shouldBe true
    import graft.markov.Connectivity
    Connectivity.isConnected(DenseMatrix((1.0, 1.0), (1.0, 1.0))) shouldBe true
    // 0 -> 1 only: two SCCs
    Connectivity.isConnected(DenseMatrix((0.0, 1.0), (0.0, 0.0))) shouldBe false
    // reference semantics: "largest" = most STATES, not most counts —
    // {1,2} (2 states) precedes {0} even though {0} carries weight 5
    val sets = Connectivity.connectedSets(DenseMatrix(
      (5.0, 0.0, 0.0), (0.0, 1.0, 1.0), (0.0, 1.0, 1.0)))
    sets.map(_.toSeq) shouldBe Seq(Seq(1, 2), Seq(0))
    Connectivity.largestConnectedSet(DenseMatrix(
      (5.0, 0.0, 0.0), (0.0, 1.0, 1.0), (0.0, 1.0, 1.0))).toSeq shouldBe Seq(1, 2)
  }

  test("ksum/kdot recover precision a naive sum loses") {
    val xs = Array.fill(10000)(0.1) :+ 1e16 :+ -1e16
    LinAlg.ksum(xs) shouldBe 1000.0 +- 1e-9
    val a = Array(1e16, 1.0, -1e16)
    val b = Array(1.0, 123.456, 1.0)
    LinAlg.kdot(a, b) shouldBe 123.456 +- 1e-9
  }

  test("logsumexp stability and pair consistency") {
    LinAlg.logsumexpPair(Double.NegativeInfinity, 3.0) shouldBe 3.0
    LinAlg.logsumexp(Array(1000.0, 1000.0)) shouldBe (1000.0 + math.log(2.0)) +- 1e-12
    LinAlg.logsumexpPair(2.0, 3.0) shouldBe LinAlg.logsumexp(Array(2.0, 3.0)) +- 1e-12
  }
}
