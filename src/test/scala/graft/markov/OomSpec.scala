package graft.markov

import breeze.linalg.{sum => bsum}
import graft.SparkSpec
import graft.data.MarkovSim
import org.scalatest.matchers.should.Matchers

/** OOM / Koopman-reweighted MSM (reference tests/markov/msm/test_oom_msm.py
  * strategy: on equilibrium Markovian data, the OOM estimate agrees with
  * the plain MSM; OOM eigenvalues approximate the true spectrum). */
class OomSpec extends SparkSpec with Matchers {

  lazy val chain = MarkovSim.defaultBirthDeath
  lazy val dtraj = MarkovSim.simulate(spark, chain.transitionMatrix,
    nTraj = 8, length = 4000, seed = 19L).cache()

  test("two-step counts marginalize to one-step counts") {
    val c2 = Oom.twoStepCounts(dtraj, 1).collect()
    // marginal over s2 = sliding counts on the sub-range [0, T-2tau)
    val margin = c2.groupBy(r => (r.getInt(0), r.getInt(1)))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    // recompute directly
    val direct = Oom.twoStepCounts(dtraj, 1)
      .groupBy("s0", "s1").sum("cnt").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    margin shouldBe direct
    // sanity: total two-step transitions = sum over trajs of (len - 2)
    val total = c2.map(_.getLong(3)).sum
    total shouldBe 8L * (4000 - 2)
  }

  test("OOM model recovers the true transition matrix on Markovian data") {
    val model = Oom.fit(dtraj, tau = 1, nStates = chain.n, rankTol = 5.0)
    model.oomRank should be >= 3
    val msm = model.msm
    msm.isTransitionMatrix(1e-8) shouldBe true
    // close to the truth elementwise
    model.states.length shouldBe chain.n
    for (i <- 0 until chain.n; j <- 0 until chain.n)
      model.transitionMatrix(i, j) shouldBe chain.transitionMatrix(i, j) +- 0.06
    // slowest OOM timescale near the true one
    val trueT1 = MarkovStateModel(chain.transitionMatrix).timescales(1).head
    val oomT1 = model.oomTimescales.head
    math.abs(oomT1 - trueT1) / trueT1 should be < 0.3
  }

  test("bootstrap rank keeps all components for a well-sampled chain") {
    val ct = TransitionCounting.toDense(
      TransitionCounting.slidingCounts(dtraj, 1), chain.n)
    val keep = Oom.bootstrapRank(ct, nbs = 100, tol = 5.0)
    keep.count(identity) should be >= 4
  }
}
