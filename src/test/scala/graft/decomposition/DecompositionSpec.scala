package graft.decomposition

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkSpec
import graft.linalg.LinAlg
import org.scalatest.matchers.should.Matchers

/** TICA/VAMP vs closed-form linear-system oracles
  * (parity targets: reference tests/decomposition/test_tica.py,
  * test_vamp.py — deterministic seeded fixtures). */
class DecompositionSpec extends SparkSpec with Matchers {

  /** AR(1) trajectory x_{t+1} = a*x_t + noise per dim: TICA eigenvalues at
    * lag 1 approach the mixing coefficients. */
  def ar1(spark: org.apache.spark.sql.SparkSession, a: Array[Double], nTraj: Int,
          len: Int, seed: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = for {
      traj <- 0 until nTraj
      init = Array.fill(a.length)(rnd.nextGaussian())
      series = Iterator.iterate(init)(x =>
        x.zip(a).map { case (v, ai) => ai * v + math.sqrt(1 - ai * ai) * rnd.nextGaussian() })
        .take(len).toSeq
      (x, t) <- series.zipWithIndex
    } yield (traj.toLong, t.toLong, x)
    rows.toDF("traj_id", "t", "features")
  }

  test("spd ops: inv_sqrt and inv_split invert an SPD matrix") {
    val m = DenseMatrix((4.0, 1.0), (1.0, 3.0))
    val isqrt = LinAlg.spdInvSqrt(m)
    val ident = isqrt * m * isqrt
    ident(0, 0) shouldBe 1.0 +- 1e-10
    ident(1, 1) shouldBe 1.0 +- 1e-10
    ident(0, 1) shouldBe 0.0 +- 1e-10
    val l = LinAlg.spdInvSplit(m)
    val minv = l * l.t
    val prod = minv * m
    prod(0, 0) shouldBe 1.0 +- 1e-10
    prod(1, 0) shouldBe 0.0 +- 1e-10
  }

  test("eig_corr solves the generalized eigenproblem") {
    val c0 = DenseMatrix((2.0, 0.3), (0.3, 1.0))
    val ct = DenseMatrix((1.2, 0.1), (0.1, 0.4))
    val (vals, vecs) = LinAlg.eigCorr(c0, ct)
    // check C_t r = lambda C_0 r for each pair
    for (j <- 0 until vals.length) {
      val r = vecs(::, j)
      val lhs = ct * r
      val rhs = c0 * r * vals(j)
      (0 until 2).foreach(i => lhs(i) shouldBe rhs(i) +- 1e-9)
    }
  }

  test("TICA scaling modes match the reference formulas (_tica.py:150-158)") {
    import graft.agg.Covariance
    import graft.lag.Lag
    val a = Array(0.9, 0.2)
    val traj = ar1(spark, a, nTraj = 3, len = 2000, seed = 11)
    val cov = Covariance.fit(Lag.pairs(traj, 1))
    val none = Tica.fitFromCovariance(cov, 1)
    val km = Tica.fitFromCovariance(cov, 1, scaling = "kinetic_map")
    val cm = Tica.fitFromCovariance(cov, 1, scaling = "commute_map")
    val k = none.k
    for (j <- 0 until k; i <- 0 until cov.d) {
      // kinetic map scales column j by eigenvalue lambda_j
      km.u(i * k + j) shouldBe none.u(i * k + j) * none.singularValues(j) +- 1e-12
      // commute map scales by sqrt(regularized_timescale / 2)
      val lam = none.singularValues(j)
      val ts = 1.0 - 1.0 / math.log(math.abs(lam))
      val reg = 0.5 * ts * math.max(math.tanh(math.Pi * ((ts - 1.0) / 1.0) + 1), 0.0)
      cm.u(i * k + j) shouldBe none.u(i * k + j) * math.sqrt(reg / 2.0) +- 1e-12
    }
    // VAMP kinetic map scales BOTH singular function sets by sigma
    val vn = Vamp.fitFromCovariance(cov, 1)
    val vkm = Vamp.fitFromCovariance(cov, 1, scaling = "km")
    val vk = vn.k
    for (j <- 0 until vk; i <- 0 until cov.d) {
      vkm.u(i * vk + j) shouldBe vn.u(i * vk + j) * vn.singularValues(j) +- 1e-12
      vkm.vOpt.get(i * vk + j) shouldBe
        vn.vOpt.get(i * vk + j) * vn.singularValues(j) +- 1e-12
    }
  }

  test("TICA on AR(1) recovers mixing coefficients as eigenvalues") {
    val a = Array(0.9, 0.2)
    val traj = ar1(spark, a, nTraj = 5, len = 4000, seed = 42)
    val m = Tica.fit(traj, tau = 1)
    // leading TICA eigenvalue ~ 0.9, second ~ 0.2 (sampling noise ~ 1/sqrt(N))
    m.singularValues(0) shouldBe 0.9 +- 0.05
    m.singularValues(1) shouldBe 0.2 +- 0.05
    m.timescales.head shouldBe (-1.0 / math.log(0.9)) +- 5.0
  }

  test("VAMP on AR(1): singular values match mixing, projection works") {
    val a = Array(0.8, 0.1)
    val traj = ar1(spark, a, nTraj = 4, len = 4000, seed = 7)
    val m = Vamp.fit(traj, tau = 1)
    m.singularValues(0) shouldBe 0.8 +- 0.06
    val out = m.transform(traj)
    out.count() shouldBe traj.count()
    out.select("projection").head().getSeq[Double](0).length shouldBe m.k
    // VAMP-2 score is at least 1 (constant function) and bounded by 1+sum sigma^2
    m.score("VAMP2") should be >= 1.0
  }

  test("DMD recovers the AR(1) operator diagonal") {
    val a = Array(0.7, 0.3)
    val traj = ar1(spark, a, nTraj = 4, len = 4000, seed = 13)
    val m = Dmd.fit(traj, tau = 1)
    val evs = m.eigenvaluesRe.sorted.reverse
    evs(0) shouldBe 0.7 +- 0.06
    evs(1) shouldBe 0.3 +- 0.06
  }
}
