package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous dynamical-system generators (reference data/_datasets.py:476-1238,
  * C++ drift/diffusion definitions src/include/deeptime/data/systems.h,
  * integrators src/include/deeptime/data/integrator.h).
  *
  * Spark-first shape: `trajectories` fans out ONE TASK PER TRAJECTORY; each
  * task owns a SplittableRandom stream derived from (seed, traj_id), so
  * results are bit-reproducible under any scheduling/parallelism, and the
  * generated table is born distributed — at scale these generators can fill
  * a 100 TB table without any driver involvement beyond the job submit. */
object Generators {

  /** A time-independent SDE dX = f(X) dt + Sigma dW (sde_tag systems).
    * `sigma` is the DIM x DIM diffusion matrix, row-major. */
  trait SdeSystem extends Serializable {
    def dim: Int
    def drift(x: Array[Double], out: Array[Double]): Unit
    def sigma: Array[Double]
    def defaultH: Double
    def defaultNSteps: Int
  }

  /** A time-dependent ODE dx/dt = f(t, x) (ode_tag systems). */
  trait OdeSystem extends Serializable {
    def dim: Int
    def f(t: Double, x: Array[Double], out: Array[Double]): Unit
    def defaultH: Double
    def defaultNSteps: Int
  }

  // ---------------------------------------------------------------- systems

  /** dX = -alpha X dt + Sigma dW, alpha=1, sigma=2/beta, beta=4
    * (systems.h:183 OrnsteinUhlenbeck). Euler-Maruyama gives the exact
    * AR(1) x_{t+1} = (1 - alpha h) x_t + sigma sqrt(h) xi. */
  case class OrnsteinUhlenbeck(alpha: Double = 1.0, beta: Double = 4.0) extends SdeSystem {
    val dim = 1
    def drift(x: Array[Double], out: Array[Double]): Unit = out(0) = -alpha * x(0)
    val sigma: Array[Double] = Array(2.0 / beta)
    val defaultH = 1e-3; val defaultNSteps = 500
  }

  /** Prinz quadruple-well 1-d potential (systems.h:211; Prinz et al. 2011):
    * V(x) = 4(x^8 + 0.8 e^{-80x^2} + 0.2 e^{-80(x-.5)^2} + 0.5 e^{-40(x+.5)^2}). */
  case class PrinzPotential(mass: Double = 1.0, damping: Double = 1.0,
                            kT: Double = 1.0) extends SdeSystem {
    val dim = 1
    def drift(x: Array[Double], out: Array[Double]): Unit = {
      val v = x(0)
      out(0) = -4.0 / (mass * damping) * (8.0 * math.pow(v, 7) -
        128.0 * math.exp(-80.0 * v * v) * v -
        32.0 * math.exp(-80.0 * (v - 0.5) * (v - 0.5)) * (v - 0.5) -
        40.0 * math.exp(-40.0 * (v + 0.5) * (v + 0.5)) * (v + 0.5))
    }
    val sigma: Array[Double] = Array(math.sqrt(2.0 * kT / (mass * damping)))
    val defaultH = 1e-5; val defaultNSteps = 500
  }

  /** Triple-well 1-d on [0, 6] (systems.h:248): sextic polynomial potential,
    * sigma = 0.75. */
  case object TripleWell1D extends SdeSystem {
    val dim = 1
    def drift(x: Array[Double], out: Array[Double]): Unit = {
      val v = x(0)
      out(0) = -1.0 * (-24.82002100 + 82.85029600 * v - 82.6031550 * v * v +
        34.125104 * math.pow(v, 3) - 6.20030 * math.pow(v, 4) + 0.4104 * math.pow(v, 5))
    }
    val sigma: Array[Double] = Array(0.75)
    val defaultH = 1e-3; val defaultNSteps = 500
  }

  /** Double well 2-d, V = (x^2-1)^2 + y^2 (systems.h:279). */
  case class DoubleWell2D(mass: Double = 1.0, damping: Double = 1.0,
                          kT: Double = 1.0) extends SdeSystem {
    val dim = 2
    def drift(x: Array[Double], out: Array[Double]): Unit = {
      out(0) = -4.0 * x(0) * x(0) * x(0) + 4.0 * x(0)
      out(1) = -2.0 * x(1)
    }
    val sigma: Array[Double] = {
      val s = math.sqrt(0.5 * kT / (mass * damping))
      Array(s, 0.0, 0.0, s)
    }
    val defaultH = 1e-3; val defaultNSteps = 10000
  }

  /** Quadruple well 2-d, V = (x^2-1)^2 + (y^2-1)^2, sigma = sqrt(.5)
    * (systems.h:312). */
  case object QuadrupleWell2D extends SdeSystem {
    val dim = 2
    def drift(x: Array[Double], out: Array[Double]): Unit = {
      out(0) = -4.0 * x(0) * x(0) * x(0) + 4.0 * x(0)
      out(1) = -4.0 * x(1) * x(1) * x(1) + 4.0 * x(1)
    }
    val sigma: Array[Double] = { val s = 0.70710678118; Array(s, 0.0, 0.0, s) }
    val defaultH = 1e-3; val defaultNSteps = 10000
  }

  /** Asymmetric quadruple well 2-d (systems.h:341), sigma = 0.6. */
  case object QuadrupleWellAsymmetric2D extends SdeSystem {
    val dim = 2
    def drift(x: Array[Double], out: Array[Double]): Unit = {
      out(0) = -4.0 * math.pow(x(0), 3) + (3.0 / 16.0) * x(0) * x(0) + 4.0 * x(0) - 3.0 / 16.0
      out(1) = -4.0 * math.pow(x(1), 3) + (3.0 / 8.0) * x(1) * x(1) + 4.0 * x(1) - 3.0 / 8.0
    }
    val sigma: Array[Double] = Array(0.6, 0.0, 0.0, 0.6)
    val defaultH = 1e-3; val defaultNSteps = 10000
  }

  /** Triple well 2-d (systems.h:368): three gaussian wells + quartic
    * confinement, sigma = 1.09. */
  case object TripleWell2D extends SdeSystem {
    val dim = 2
    def drift(xv: Array[Double], out: Array[Double]): Unit = {
      val x = xv(0); val y = xv(1)
      val e1 = math.exp(-x * x - (y - 1.0 / 3) * (y - 1.0 / 3))
      val e2 = math.exp(-x * x - (y - 5.0 / 3) * (y - 5.0 / 3))
      val e3 = math.exp(-(x - 1.0) * (x - 1.0) - y * y)
      val e4 = math.exp(-(x + 1.0) * (x + 1.0) - y * y)
      out(0) = -(3 * e1 * (-2 * x) - 3 * e2 * (-2 * x) - 5 * e3 * (-2 * (x - 1.0)) -
        5 * e4 * (-2 * (x + 1.0)) + 0.8 * math.pow(x, 3))
      out(1) = -(3 * e1 * (-2 * (y - 1.0 / 3)) - 3 * e2 * (-2 * (y - 5.0 / 3)) -
        5 * e3 * (-2 * y) - 5 * e4 * (-2 * y) + 0.8 * math.pow(y - 1.0 / 3, 3))
    }
    val sigma: Array[Double] = Array(1.09, 0.0, 0.0, 1.09)
    val defaultH = 1e-5; val defaultNSteps = 10000
  }

  /** Lorenz attractor, sigma=10, beta=8/3, rho=28 (systems.h:82). */
  case object Lorenz extends OdeSystem {
    val dim = 3
    def f(t: Double, x: Array[Double], out: Array[Double]): Unit = {
      out(0) = 10.0 * (x(1) - x(0))
      out(1) = x(0) * (28.0 - x(2)) - x(1)
      out(2) = x(0) * x(1) - (8.0 / 3.0) * x(2)
    }
    val defaultH = 2e-5; val defaultNSteps = 100
  }

  /** Arnold-Beltrami-Childress flow, a=sqrt(3), b=sqrt(2), c=1
    * (systems.h:54). */
  case object AbcFlow extends OdeSystem {
    val dim = 3
    private val a = 1.73205080757; private val b = 1.41421356237; private val c = 1.0
    def f(t: Double, x: Array[Double], out: Array[Double]): Unit = {
      out(0) = a * math.sin(x(2)) + c * math.cos(x(1))
      out(1) = b * math.sin(x(0)) + a * math.cos(x(2))
      out(2) = c * math.sin(x(1)) + b * math.cos(x(0))
    }
    val defaultH = 1e-3; val defaultNSteps = 10000
  }

  /** Thomas attractor with b = 0.2 (systems.h:110). */
  case object ThomasAttractor extends OdeSystem {
    val dim = 3
    def f(t: Double, x: Array[Double], out: Array[Double]): Unit = {
      out(0) = math.sin(x(1)) - 0.2 * x(0)
      out(1) = math.sin(x(2)) - 0.2 * x(1)
      out(2) = math.sin(x(0)) - 0.2 * x(2)
    }
    val defaultH = 1e-3; val defaultNSteps = 10000
  }

  /** Bickley jet: time-dependent 2-d flow of an idealized stratospheric
    * jet (systems.h:135; data/_datasets.py:162), periodic in x with period
    * 20. */
  case object BickleyJet extends OdeSystem {
    val dim = 2
    private val u0 = 5.4138; private val l0 = 1.77; private val r0 = 6.371
    private val eps = Array(0.075, 0.15, 0.3)
    private val cArr = Array(u0 * 0.1446, u0 * 0.205, u0 * 0.461)
    private val kArr = Array(2.0 / r0, 4.0 / r0, 6.0 / r0)
    private def sech(t: Double) = 1.0 / math.cosh(t)
    def f(t: Double, x: Array[Double], out: Array[Double]): Unit = {
      val xx = x(0); val y = x(1)
      val sh = sech(y / l0)
      val sh2 = sh * sh
      var sumPsiX = 0.0; var sumPsiY = 0.0
      var i = 0
      while (i < 3) {
        val arg = kArr(i) * (xx - cArr(i) * t)
        sumPsiX += eps(i) * kArr(i) * math.sin(arg)
        sumPsiY += eps(i) * math.cos(arg)
        i += 1
      }
      // u = U0 sech^2 + 2 U0 tanh sech^2 * Re(f); v = U0 L0 sech^2 * Re(df/dx)
      // with Re(df/dx) = -sum eps_j k_j sin(k_j (x - c_j t))  (systems.h:150-166;
      // the minus sign keeps the field divergence-free)
      val tanhY = math.tanh(y / l0)
      out(0) = u0 * sh2 + 2.0 * u0 * tanhY * sh2 * sumPsiY
      out(1) = -u0 * l0 * sh2 * sumPsiX
    }
    val defaultH = 1e-2; val defaultNSteps = 10
  }

  // ------------------------------------------------------------ integrators

  /** Euler-Maruyama step (integrator.h:92): x += h f(x) + sqrt(h) Sigma w. */
  private[data] def emSteps(sys: SdeSystem, x: Array[Double], h: Double, nSteps: Int,
                            rng: java.util.SplittableRandom): Unit = {
    val d = sys.dim
    val mu = new Array[Double](d)
    val w = new Array[Double](d)
    val sqrth = math.sqrt(h)
    var s = 0
    while (s < nSteps) {
      sys.drift(x, mu)
      var k = 0
      while (k < d) { w(k) = rng.nextGaussian(); k += 1 }
      var j = 0
      while (j < d) {
        var acc = x(j) + h * mu(j)
        k = 0
        while (k < d) { acc += sys.sigma(j * d + k) * sqrth * w(k); k += 1 }
        x(j) = acc
        j += 1
      }
      s += 1
    }
  }

  /** Classic RK4 step chain (integrator.h:17). */
  private[data] def rk4Steps(sys: OdeSystem, x: Array[Double], t0: Double,
                             h: Double, nSteps: Int): Double = {
    val d = sys.dim
    val k1 = new Array[Double](d); val k2 = new Array[Double](d)
    val k3 = new Array[Double](d); val k4 = new Array[Double](d)
    val yt = new Array[Double](d)
    var t = t0
    var s = 0
    while (s < nSteps) {
      sys.f(t, x, k1)
      var j = 0
      while (j < d) { yt(j) = x(j) + h / 2 * k1(j); j += 1 }
      sys.f(t + h / 2, yt, k2)
      j = 0
      while (j < d) { yt(j) = x(j) + h / 2 * k2(j); j += 1 }
      sys.f(t + h / 2, yt, k3)
      j = 0
      while (j < d) { yt(j) = x(j) + h * k3(j); j += 1 }
      sys.f(t + h, yt, k4)
      j = 0
      while (j < d) { x(j) = x(j) + h / 6.0 * (k1(j) + 2 * k2(j) + 2 * k3(j) + k4(j)); j += 1 }
      t += h
      s += 1
    }
    t
  }

  // ------------------------------------------------------------- generation

  /** Distributed SDE trajectories: `nTraj` trajectories of `length` frames
    * each, starting from `x0` (recycled over trajectories), one frame every
    * `nSteps` integrator sub-steps of size `h`. Canonical output
    * (traj_id, t, features). */
  def trajectories(spark: SparkSession, sys: SdeSystem, x0: Array[Array[Double]],
                   nTraj: Int, length: Int, seed: Long,
                   h: Double = -1, nSteps: Int = -1): DataFrame = {
    import spark.implicits._
    val hh = if (h > 0) h else sys.defaultH
    val ns = if (nSteps > 0) nSteps else sys.defaultNSteps
    spark.range(nTraj.toLong)
      .repartition(math.min(nTraj, spark.sparkContext.defaultParallelism))
      .as[Long]
      .flatMap { id =>
        val rng = new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L))
        val x = x0((id % x0.length).toInt).clone()
        (0 until length).iterator.map { t =>
          if (t > 0) emSteps(sys, x, hh, ns, rng)
          (id, t.toLong, x.toSeq)
        }
      }
      .toDF("traj_id", "t", "features")
  }

  /** Distributed ODE trajectories (deterministic; seed only varies initial
    * conditions when `jitter > 0`). */
  def odeTrajectories(spark: SparkSession, sys: OdeSystem, x0: Array[Array[Double]],
                      nTraj: Int, length: Int, seed: Long = 0L, jitter: Double = 0.0,
                      h: Double = -1, nSteps: Int = -1): DataFrame = {
    import spark.implicits._
    val hh = if (h > 0) h else sys.defaultH
    val ns = if (nSteps > 0) nSteps else sys.defaultNSteps
    spark.range(nTraj.toLong)
      .repartition(math.min(nTraj, spark.sparkContext.defaultParallelism))
      .as[Long]
      .flatMap { id =>
        val rng = new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L))
        val x = x0((id % x0.length).toInt).clone()
        if (jitter > 0) (0 until sys.dim).foreach(i => x(i) += jitter * rng.nextGaussian())
        var t = 0.0
        (0 until length).iterator.map { frame =>
          if (frame > 0) t = rk4Steps(sys, x, t, hh, ns)
          (id, frame.toLong, x.toSeq)
        }
      }
      .toDF("traj_id", "t", "features")
  }
}
