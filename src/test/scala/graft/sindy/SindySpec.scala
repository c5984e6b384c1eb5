package graft.sindy

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** SINDy/STLSQ (reference tests/sindy/test_sindy.py strategy: recover the
  * governing equations of known systems from data). */
class SindySpec extends SparkSpec with Matchers {

  test("recovers a 2-d linear system from exact-derivative data") {
    // dx/dt = -0.5 x + 2 y ; dy/dt = -2 x - 0.5 y (damped rotation),
    // sampled along a trajectory from the analytic solution
    import spark.implicits._
    val dt = 0.01
    val rows = (0 until 4000).map { k =>
      val t = k * dt
      val decay = math.exp(-0.5 * t)
      val x = decay * math.cos(2 * t)
      val y = -decay * math.sin(2 * t)
      (0L, k.toLong, Seq(x, y))
    }
    val traj = rows.toDF("traj_id", "t", "features")
    val model = Sindy.fit(traj, inputDim = 2, degree = 2,
      threshold = 0.1, alpha = 1e-8, dt = dt)
    // library order for degree<=2 over (x0, x1):
    // [1, x1, x1^2, x0, x0 x1, x0^2] sorted by (degree, lexicographic)
    val names = model.featureNames
    val iX = names.indexOf("x0")
    val iY = names.indexOf("x1")
    model.coef(0, iX) shouldBe -0.5 +- 0.02
    model.coef(0, iY) shouldBe 2.0 +- 0.02
    model.coef(1, iX) shouldBe -2.0 +- 0.02
    model.coef(1, iY) shouldBe -0.5 +- 0.02
    // all other coefficients thresholded to zero
    for (i <- 0 until 2; k <- 0 until model.p if k != iX && k != iY)
      model.coef(i, k) shouldBe 0.0
  }

  test("recovers the lorenz system from RK4 data") {
    val traj = graft.data.Generators.odeTrajectories(spark, graft.data.Generators.Lorenz,
      Array(Array(-8.0, 8.0, 27.0)), nTraj = 1, length = 5000, h = 2e-5, nSteps = 100)
    val dt = 2e-5 * 100
    val model = Sindy.fit(traj, inputDim = 3, degree = 2,
      threshold = 0.5, alpha = 1e-10, dt = dt)
    val names = model.featureNames
    val iX = names.indexOf("x0"); val iY = names.indexOf("x1"); val iZ = names.indexOf("x2")
    val iXZ = names.indexOf("x0 x2"); val iXY = names.indexOf("x0 x1")
    // dx = 10(y - x)
    model.coef(0, iX) shouldBe -10.0 +- 0.3
    model.coef(0, iY) shouldBe 10.0 +- 0.3
    // dy = x(28 - z) - y
    model.coef(1, iX) shouldBe 28.0 +- 0.8
    model.coef(1, iY) shouldBe -1.0 +- 0.3
    model.coef(1, iXZ) shouldBe -1.0 +- 0.05
    // dz = xy - 8/3 z
    model.coef(2, iXY) shouldBe 1.0 +- 0.05
    model.coef(2, iZ) shouldBe -8.0 / 3.0 +- 0.3
  }

  test("predictColumn reproduces fitted derivatives") {
    import spark.implicits._
    val dt = 0.01
    val rows = (0 until 1000).map { k =>
      val x = math.exp(-0.3 * k * dt)
      (0L, k.toLong, Seq(x))
    }
    val traj = rows.toDF("traj_id", "t", "features")
    val model = Sindy.fit(traj, inputDim = 1, degree = 1,
      threshold = 0.05, alpha = 1e-10, dt = dt)
    val pred = traj.withColumn("p", model.predictColumn(col("features")))
      .select(expr("p[0]").as("p"), expr("-0.3 * features[0]").as("truth"))
      .agg(max(abs(col("p") - col("truth")))).collect()(0).getDouble(0)
    pred should be < 1e-3
  }
}
