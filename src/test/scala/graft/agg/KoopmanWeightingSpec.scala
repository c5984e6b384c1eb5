package graft.agg

import graft.SparkSpec
import graft.lag.Lag
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Koopman reweighting (reference tests/covariance/test_koopman_weights:
  * weights average to 1 by construction; equilibrium data gives ~uniform
  * weights; off-equilibrium data is pulled toward stationarity). */
class KoopmanWeightingSpec extends SparkSpec with Matchers {

  test("empirical mean of weights is exactly 1; equilibrium weights ~ 1") {
    val traj = graft.data.Generators.trajectories(spark,
      graft.data.Generators.OrnsteinUhlenbeck(), Array(Array(0.0)),
      nTraj = 8, length = 2000, seed = 7L, h = 1e-3, nSteps = 100)
      .where(col("t") >= 200).cache() // equilibrated
    val model = KoopmanWeighting.fit(traj, tau = 1)
    val weighted = model.transform(Lag.pairs(traj, 1).withColumnRenamed("x", "features"))
    val stats = weighted.agg(avg("koopman_weight"), stddev_pop("koopman_weight")).collect()(0)
    stats.getDouble(0) shouldBe 1.0 +- 1e-6
    // already at equilibrium: weights nearly uniform
    stats.getDouble(1) should be < 0.1
  }

  test("off-equilibrium start: reweighted mean closer to stationary (0) than empirical") {
    // all trajectories start far off-equilibrium at x=1.5 and only
    // partially relax: empirical mean is biased away from 0
    val traj = graft.data.Generators.trajectories(spark,
      graft.data.Generators.OrnsteinUhlenbeck(), Array(Array(1.5)),
      nTraj = 16, length = 60, seed = 11L, h = 1e-3, nSteps = 10).cache()
    val cov = Covariance.fit(Lag.pairs(traj, 1))
    val empiricalMean = cov.mean0(0)
    empiricalMean should be > 0.3 // clearly biased
    val reweighted = KoopmanWeighting.reweightedCovariance(traj, tau = 1)
    math.abs(reweighted.mean0(0)) should be < math.abs(empiricalMean)
  }
}
