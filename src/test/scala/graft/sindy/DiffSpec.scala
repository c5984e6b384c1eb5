package graft.sindy

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.util.Diff
import graft.SparkSpec

/** TV-regularized derivative vs the reference's test
  * (tests/util/test_diff.py): noisy sine must yield cosine within 0.5
  * max-abs error, and a warm restart must be stable. */
class DiffSpec extends AnyFunSuite with Matchers {

  test("fornberg weights reproduce classic stencils") {
    // central 3-point first derivative on unit grid: [-1/2, 0, 1/2]
    val w = Diff.fdCoefficients(0.0, Array(-1.0, 0.0, 1.0), 1)
    w(0) shouldBe -0.5 +- 1e-12
    w(1) shouldBe 0.0 +- 1e-12
    w(2) shouldBe 0.5 +- 1e-12
    // one-sided 3-point: [-3/2, 2, -1/2]
    val w2 = Diff.fdCoefficients(0.0, Array(0.0, 1.0, 2.0), 1)
    w2(0) shouldBe -1.5 +- 1e-12
    w2(1) shouldBe 2.0 +- 1e-12
    w2(2) shouldBe -0.5 +- 1e-12
  }

  test("tv derivative of noisy sine approximates cosine (reference test_diff.py)") {
    val n = 400
    val rng = new scala.util.Random(42)
    val xs = Array.tabulate(n)(i => 2.0 * math.Pi * i / (n - 1))
    val noisy = xs.map(x => math.sin(x) + 0.08 * rng.nextGaussian())
    val df = Diff.tvDerivative(xs, noisy, alpha = 0.01, tol = 1e-5,
      maxIt = 1000, fdWindowRadius = 5)
    val maxErr = xs.indices.map(i => math.abs(df(i) - math.cos(xs(i)))).max
    maxErr should be < 0.5
    // warm restart reproduces itself coarsely (reference df vs df2, 1dp)
    val df2 = Diff.tvDerivative(xs, noisy, u0 = Some(df), alpha = 0.01,
      tol = 1e-5, maxIt = 1000, fdWindowRadius = 5)
    xs.indices.foreach(i => df2(i) shouldBe df(i) +- 0.1)
    // and the plain central difference is NOT usable on this noise level
    val central = xs.indices.map { i =>
      val h = xs(1) - xs(0)
      if (i == 0 || i == n - 1) 0.0
      else math.abs((noisy(i + 1) - noisy(i - 1)) / (2 * h) - math.cos(xs(i)))
    }.max
    central should be > 2.0
  }
}

/** SINDy with the TV derivative recovers dynamics from NOISY observations
  * where the central difference fails (VERDICT r02 item 5). */
class SindyTvSpec extends SparkSpec with Matchers {

  test("sindy + tv derivative recovers dx/dt = -0.5 x from noisy data") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val dt = 0.05
    val rows = for {
      traj <- 0 until 8
      x0 = 1.0 + 0.25 * traj
      t <- 0 until 200
    } yield (traj.toLong, t.toLong,
      Seq(x0 * math.exp(-0.5 * t * dt) + 0.002 * rng.nextGaussian()))
    import spark.implicits._
    val df = rows.toDF("traj_id", "t", "features")
    val model = Sindy.fit(df, inputDim = 1, degree = 2, threshold = 0.05,
      alpha = 0.01, dt = dt, tvAlpha = 0.01)
    // library: [1, x, x^2]; expect coefficient ~ -0.5 on x, ~0 elsewhere
    model.coef(0, 1) shouldBe -0.5 +- 0.1
    math.abs(model.coef(0, 0)) should be < 0.05
    math.abs(model.coef(0, 2)) should be < 0.12
  }
}
