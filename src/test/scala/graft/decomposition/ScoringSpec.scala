package graft.decomposition

import graft.SparkSpec
import graft.agg.Covariance
import graft.lag.Lag
import org.scalatest.matchers.should.Matchers

/** VAMP scoring (reference tests/decomposition/test_vamp.py score sections:
  * self-consistency between VAMP-1/2/E on the training data; CV scores
  * cluster near the self-score). */
class ScoringSpec extends SparkSpec with Matchers {

  def ouTraj(n: Int, seed: Long) = graft.data.Generators.trajectories(spark,
    graft.data.Generators.OrnsteinUhlenbeck(), Array(Array(0.0)),
    nTraj = 8, length = n, seed = seed, h = 1e-3, nSteps = 100)

  lazy val traj = ouTraj(1500, 5L).cache()

  test("self-scores: VAMP2 = 1 + sum sigma^2; VAMPE consistent on train data") {
    val cov = Covariance.fit(Lag.pairs(traj, 1))
    val model = Vamp.fitFromCovariance(cov, 1)
    val s2 = Scoring.vampScore(model, cov, "VAMP2")
    val expected = 1.0 + model.singularValues.map(s => s * s).sum
    s2 shouldBe expected +- 1e-6
    val s1 = Scoring.vampScore(model, cov, "VAMP1")
    s1 shouldBe 1.0 + model.singularValues.sum +- 1e-6
    // on the training covariances VAMP-E equals VAMP-2 (optimal model)
    val se = Scoring.vampScore(model, cov, "VAMPE")
    se shouldBe s2 +- 1e-6
  }

  test("cv scores: n splits, each near the self-score, all > 1") {
    val cov = Covariance.fit(Lag.pairs(traj, 1))
    val model = Vamp.fitFromCovariance(cov, 1)
    val self = Scoring.vampScore(model, cov, "VAMP2")
    val cvs = Scoring.vampScoreCv(traj, tau = 1, n = 5, method = "VAMP2", seed = 3L)
    cvs.length shouldBe 5
    cvs.foreach { s =>
      s should be > 1.0
      math.abs(s - self) / self should be < 0.15
    }
  }

  test("koopman ck test: predictions track estimates on Markovian OU data") {
    val ck = Scoring.koopmanCkTest(traj, tau = 1, steps = 4)
    ck.lagtimes shouldBe Array(1, 2, 3, 4)
    // at tau itself prediction == estimate by construction
    breeze.linalg.max(breeze.numerics.abs(
      ck.predictions(0) - ck.estimates(0))) should be < 1e-10
    // OU is exactly Markovian: CK holds within sampling noise at higher lags
    (1 until 4).foreach { i =>
      val diff = breeze.linalg.max(breeze.numerics.abs(
        ck.predictions(i) - ck.estimates(i)))
      diff should be < 0.08
    }
    // the dominant (1,1)-entry decays like sigma^k
    val sigma = Covariance.fit(Lag.pairs(traj, 1))
    val m = Vamp.fitFromCovariance(sigma, 1)
    val s1 = m.singularValues.head
    ck.predictions(1)(0, 0) / ck.predictions(0)(0, 0) shouldBe s1 +- 0.05
  }

  test("block pairs never cross block boundaries") {
    import org.apache.spark.sql.functions._
    val bp = Scoring.blockPairs(traj, tau = 2, blocksize = 4)
    // within a block of size 4 at tau=2 only frames 0,1 pair up
    val counts = bp.groupBy("block").count()
    counts.agg(max("count")).collect()(0).getLong(0) should be <= 2L
  }
}
