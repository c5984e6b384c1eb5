package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** TPT / committors, including the NON-reversible backward committor
  * (reference markov/tools/analysis/_committor.py solves the adjoint BVP;
  * the q- = 1 - q+ shortcut is reversible-only). */
class TptSpec extends AnyFunSuite with Matchers {

  /** Strongly non-reversible 3-cycle 0->1->2->0 with 0.1 self-loops. */
  private val cycle: DenseMatrix[Double] = DenseMatrix(
    (0.1, 0.9, 0.0),
    (0.0, 0.1, 0.9),
    (0.9, 0.0, 0.1))

  test("backward committor on a directed cycle is NOT 1 - q+") {
    val msm = MarkovStateModel(cycle)
    val a = Set(0); val b = Set(2)
    val qp = msm.committorForward(a, b)
    val qm = msm.committorBackward(a, b)
    // forward: from 1 the only way onward is into 2 => q+(1) = 1
    qp(1) shouldBe 1.0 +- 1e-10
    // backward (time-reversed chain runs 1 -> 0): last label set was A => 1
    qm(1) shouldBe 1.0 +- 1e-10
    // the reversible shortcut would give 1 - q+(1) = 0 — must NOT hold here
    math.abs(qm(1) - (1.0 - qp(1))) should be > 0.5
  }

  test("backward committor reduces to 1 - q+ for a reversible chain") {
    // symmetric random walk on 4 states (birth-death, detailed balance)
    val t = DenseMatrix(
      (0.5, 0.5, 0.0, 0.0),
      (0.25, 0.5, 0.25, 0.0),
      (0.0, 0.25, 0.5, 0.25),
      (0.0, 0.0, 0.5, 0.5))
    val msm = MarkovStateModel(t)
    msm.isReversible(1e-9) shouldBe true
    val qp = msm.committorForward(Set(0), Set(3))
    val qm = msm.committorBackward(Set(0), Set(3))
    (0 until 4).foreach(i => qm(i) shouldBe (1.0 - qp(i)) +- 1e-9)
  }

  test("reactive flux on the cycle: total flux equals pi-weighted A->B throughput") {
    val msm = MarkovStateModel(cycle)
    val flux = Tpt.reactiveFlux(msm, Set(0), Set(2))
    // every f_ij must be nonnegative and zero on the diagonal
    for (i <- 0 until 3; j <- 0 until 3) {
      flux.grossFlux(i, j) should be >= 0.0
      if (i == j) flux.grossFlux(i, j) shouldBe 0.0
    }
    flux.totalFlux should be > 0.0
    flux.rate should be > 0.0
    // pathway decomposition recovers the dominant 0->1->2 channel
    val paths = flux.pathways(fraction = 0.99)
    paths.head._1 shouldBe Seq(0, 1, 2)

    // flux production/producers/consumers (flux/api.py:134-216): the
    // source produces all net flux, the target consumes it, interior
    // states conserve (production 0); total production balances to 0
    val prod = flux.fluxProduction
    math.abs(bsum(prod)) should be < 1e-12
    math.abs(prod(0) - flux.totalFlux) should be < 1e-10
    math.abs(prod(2) + flux.totalFlux) should be < 1e-10
    flux.fluxProducers() shouldBe Seq(0)
    flux.fluxConsumers() shouldBe Seq(2)
    math.abs(prod(1)) should be < 1e-12
    // TPT mfpt = 1 / rate
    flux.tptMfpt shouldBe (1.0 / flux.rate)
  }

  test("timescales use |lambda| for complex eigenvalue pairs") {
    val msm = MarkovStateModel(cycle)
    val evs = msm.eigenvaluesComplex()
    // cycle has a complex pair; magnitudes of the pair are equal
    val mags = evs.map { case (re, im) => math.hypot(re, im) }
    mags.head shouldBe 1.0 +- 1e-10
    // the complex pair shares one magnitude => timescales for the pair match
    val ts = msm.timescales()
    ts(0) shouldBe ts(1) +- 1e-9
    // and differ from the -tau/ln|Re| value the old code computed
    val wrongTs = -1.0 / math.log(math.abs(evs(1)._1))
    math.abs(ts(0) - wrongTs) should be > 1e-3
  }
}
