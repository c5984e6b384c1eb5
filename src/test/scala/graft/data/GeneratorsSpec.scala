package graft.data

import graft.SparkSpec
import graft.decomposition.Tica
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** SDE/ODE generators (reference data/_datasets.py; test strategy of
  * tests/data/test_datasets.py: trajectories have expected shape,
  * determinism, and known statistics — OU is exactly AR(1) so TICA must
  * recover the analytic autocorrelation). */
class GeneratorsSpec extends SparkSpec with Matchers {

  test("OU generator: deterministic, AR(1) stationary variance and TICA eigenvalue") {
    val sys = Generators.OrnsteinUhlenbeck()
    val h = 1e-3; val nSteps = 100
    val traj = Generators.trajectories(spark, sys, Array(Array(0.0)),
      nTraj = 16, length = 2000, seed = 42L, h = h, nSteps = nSteps).cache()
    traj.count() shouldBe 32000

    // determinism
    val again = Generators.trajectories(spark, sys, Array(Array(0.0)),
      nTraj = 16, length = 2000, seed = 42L, h = h, nSteps = nSteps)
    again.agg(sum(expr("features[0]"))).collect()(0).getDouble(0) shouldBe
      traj.agg(sum(expr("features[0]"))).collect()(0).getDouble(0) +- 1e-9

    // discard burn-in, compare against exact AR(1): a = (1-alpha h)^nSteps,
    // stationary var = sigma^2 h / (1 - (1-alpha h)^2)
    val warm = traj.where(col("t") >= 200)
    val a1 = math.pow(1.0 - h, nSteps)
    val varExact = sys.sigma(0) * sys.sigma(0) * h / (1.0 - (1.0 - h) * (1.0 - h))
    val varEst = warm.agg(var_pop(expr("features[0]"))).collect()(0).getDouble(0)
    math.abs(varEst - varExact) / varExact should be < 0.15

    val model = Tica.fit(warm, tau = 1)
    // single component; eigenvalue = lag-1 autocorrelation = a1
    model.singularValues.head shouldBe a1 +- 0.05
  }

  test("double-well 2d: both wells visited, x concentrated near +-1") {
    val traj = Generators.trajectories(spark, Generators.DoubleWell2D(),
      Array(Array(1.0, 0.0), Array(-1.0, 0.0)),
      nTraj = 8, length = 300, seed = 3L, nSteps = 1000).cache()
    val xs = traj.select(expr("features[0]").as("x")).cache()
    xs.where(col("x") > 0.5).count() should be > 0L
    xs.where(col("x") < -0.5).count() should be > 0L
    // metastability: most mass near the wells
    val frac = xs.where(abs(abs(col("x")) - 1.0) < 0.6).count().toDouble / xs.count()
    frac should be > 0.8
  }

  test("prinz potential stays bounded in [-1.2, 1.2]") {
    val traj = Generators.trajectories(spark, Generators.PrinzPotential(),
      Array(Array(0.0)), nTraj = 4, length = 500, seed = 11L,
      h = 1e-5, nSteps = 500)
    val mm = traj.agg(min(expr("features[0]")), max(expr("features[0]"))).collect()(0)
    mm.getDouble(0) should be > -1.2
    mm.getDouble(1) should be < 1.2
  }

  test("lorenz RK4: deterministic, bounded attractor, nontrivial motion") {
    val traj = Generators.odeTrajectories(spark, Generators.Lorenz,
      Array(Array(1.0, 1.0, 1.0)), nTraj = 2, length = 1000,
      h = 2e-5, nSteps = 100).cache()
    traj.count() shouldBe 2000
    val stats = traj.agg(
      max(abs(expr("features[0]"))), max(abs(expr("features[2]"))),
      var_pop(expr("features[0]"))).collect()(0)
    stats.getDouble(0) should be < 25.0   // |x| bounded on the attractor
    stats.getDouble(1) should be < 60.0   // z bounded
    stats.getDouble(2) should be > 1.0    // actually moving
    // both trajectories identical (same x0, deterministic ODE)
    traj.groupBy("t").agg(countDistinct(expr("round(features[0], 9)")).as("k"))
      .agg(max("k")).collect()(0).getLong(0) shouldBe 1L
  }

  test("abc flow advances and stays finite") {
    val traj = Generators.odeTrajectories(spark, Generators.AbcFlow,
      Array(Array(0.1, 0.2, 0.3)), nTraj = 1, length = 200, h = 1e-3, nSteps = 100)
    val r = traj.agg(max(abs(expr("features[0]"))),
      var_pop(expr("features[1]"))).collect()(0)
    r.getDouble(0).isNaN shouldBe false
    r.getDouble(1) should be > 0.0
  }
}
