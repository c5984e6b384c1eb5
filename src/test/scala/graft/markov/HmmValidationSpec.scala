package graft.markov.hmm

import breeze.linalg.DenseMatrix
import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** HMM Chapman-Kolmogorov test
  * (reference markov/hmm/_hidden_markov_model.py:313 ck_test via
  * identity-membership observables, _observables.py:9). */
class HmmValidationSpec extends SparkSpec with Matchers {

  // ground-truth 2-hidden-state HMM: metastable chain, well-separated
  // emissions over 5 observable symbols
  private val aTrue = Array(Array(0.93, 0.07), Array(0.06, 0.94))
  private val bTrue = Array(
    Array(0.45, 0.40, 0.10, 0.03, 0.02),
    Array(0.02, 0.03, 0.10, 0.40, 0.45))

  private def simulate(nTraj: Int, len: Int, seed: Long): Seq[Array[Int]] = {
    val rng = new java.util.SplittableRandom(seed)
    def draw(p: Array[Double]): Int = {
      val u = rng.nextDouble()
      var acc = 0.0
      var i = 0
      while (i < p.length - 1) {
        acc += p(i)
        if (u < acc) return i
        i += 1
      }
      p.length - 1
    }
    (0 until nTraj).map { _ =>
      var h = rng.nextInt(2)
      Array.fill(len) {
        val obs = draw(bTrue(h))
        h = draw(aTrue(h))
        obs
      }
    }
  }

  private def maxAbsDiff(a: DenseMatrix[Double], b: DenseMatrix[Double]): Double =
    (0 until a.rows).flatMap(i => (0 until a.cols).map(j => math.abs(a(i, j) - b(i, j)))).max

  test("HMM CK test: predictions match estimates on true-HMM data") {
    val trajs = simulate(nTraj = 40, len = 400, seed = 11L)
    val ck = HmmValidation.ckTestArrays(trajs, nHidden = 2, nObs = 5,
      tau = 1, steps = 3, maxIter = 60)

    ck.lagtimes.toSeq shouldBe Seq(0, 1, 2, 3)
    // lag 0: identity on both sides
    maxAbsDiff(ck.predictions(0), DenseMatrix.eye[Double](2)) shouldBe 0.0
    maxAbsDiff(ck.estimates(0), DenseMatrix.eye[Double](2)) shouldBe 0.0
    // lag tau: prediction IS the estimate (same model, power 1)
    maxAbsDiff(ck.predictions(1), ck.estimates(1)) shouldBe 0.0
    // every propagator row is a distribution
    (ck.predictions ++ ck.estimates).foreach { m =>
      (0 until m.rows).foreach { i =>
        math.abs((0 until m.cols).map(m(i, _)).sum - 1.0) should be < 1e-9
        (0 until m.cols).foreach(j => m(i, j) should be >= -1e-12)
      }
    }
    // CK consistency: the data IS an HMM, so A_tau^k must track A_{k*tau}
    (2 to 3).foreach { k =>
      maxAbsDiff(ck.predictions(k), ck.estimates(k)) should be < 0.05
    }
    // and the lag-1 estimate recovers the generating chain
    maxAbsDiff(ck.estimates(1),
      new DenseMatrix(2, 2, Array(0.93, 0.06, 0.07, 0.94))) should be < 0.03
  }

  test("distributed ckTest equals the driver-local ckTestArrays") {
    val trajs = simulate(nTraj = 12, len = 150, seed = 23L)
    import spark.implicits._
    val dtraj = trajs.zipWithIndex.flatMap { case (arr, id) =>
      arr.zipWithIndex.map { case (s, t) => (id.toLong, t.toLong, s) }
    }.toDF("traj_id", "t", "state")
    val local = HmmValidation.ckTestArrays(trajs, 2, 5, tau = 1, steps = 2, maxIter = 20)
    val dist = HmmValidation.ckTest(dtraj, 2, 5, tau = 1, steps = 2, maxIter = 20)
    local.lagtimes.toSeq shouldBe dist.lagtimes.toSeq
    local.predictions.zip(dist.predictions).foreach { case (a, b) =>
      maxAbsDiff(a, b) should be < 1e-6
    }
    local.estimates.zip(dist.estimates).foreach { case (a, b) =>
      maxAbsDiff(a, b) should be < 1e-6
    }
  }

  test("label alignment: permuted models are re-aligned before comparison") {
    val trajs = simulate(nTraj = 10, len = 200, seed = 31L)
    val m = Hmm.fitArrays(trajs, 2, 5, maxIter = 30)
    val swapped = HmmValidation.permute(m, Array(1, 0))
    // alignment must recover the swap exactly
    val p = HmmValidation.alignPermutation(m.emission, swapped.emission)
    HmmValidation.permute(swapped, p).transition shouldBe m.transition
  }
}
