package graft.data

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Discrete Markov-chain fixtures + distributed trajectory simulation
  * (reference data/_birth_death_chain.py, data/_double_well.py:25,
  * markov/msm/_markov_state_model.py:1014 `simulate`).
  *
  * Scale design: one executor task per trajectory (or per trajectory batch
  * via spark.range partitioning); each task derives its RNG stream
  * deterministically from (seed, traj_id) with SplittableRandom, so the
  * output is reproducible regardless of parallelism or scheduling order and
  * no state crosses task boundaries.
  */
object MarkovSim {

  /** Inverse-CDF walk of one trajectory; P row-major n x n. */
  private[data] def walk(p: Array[Double], n: Int, start: Int, length: Int,
                         rng: java.util.SplittableRandom): Array[Int] = {
    val out = new Array[Int](length)
    var s = start
    var t = 0
    while (t < length) {
      out(t) = s
      val u = rng.nextDouble()
      var acc = 0.0
      var j = 0
      var next = n - 1
      var found = false
      while (j < n && !found) {
        acc += p(s * n + j)
        if (u < acc) { next = j; found = true }
        j += 1
      }
      s = next
      t += 1
    }
    out
  }

  /** Draw from a distribution (inverse CDF). */
  private def draw(dist: Array[Double], rng: java.util.SplittableRandom): Int = {
    val u = rng.nextDouble()
    var acc = 0.0
    var i = 0
    while (i < dist.length - 1) {
      acc += dist(i)
      if (u < acc) return i
      i += 1
    }
    dist.length - 1
  }

  /** Simulate `nTraj` trajectories of `length` steps from a transition
    * matrix, distributed one-per-task. Returns the canonical dtraj frame
    * (traj_id, t, state). `startDist` defaults to uniform. */
  def simulate(spark: SparkSession, transitionMatrix: DenseMatrix[Double],
               nTraj: Int, length: Int, seed: Long,
               startDist: Option[Array[Double]] = None): DataFrame = {
    import spark.implicits._
    val n = transitionMatrix.rows
    val flat = graft.linalg.LinAlg.toFlat(transitionMatrix)
    val start = startDist.getOrElse(Array.fill(n)(1.0 / n))
    spark.range(nTraj.toLong)
      .repartition(math.min(nTraj, spark.sparkContext.defaultParallelism))
      .as[Long]
      .flatMap { id =>
        val rng = new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L))
        val s0 = draw(start, rng)
        walk(flat, n, s0, length, rng).iterator.zipWithIndex
          .map { case (s, t) => (id, t.toLong, s) }
      }
      .toDF("traj_id", "t", "state")
  }

  /** Birth-death chain on states 0..n-1 (data/_birth_death_chain.py):
    * P(i,i+1)=p_i, P(i,i-1)=q_i, P(i,i)=1-p_i-q_i, with q_0=0, p_{n-1}=0.
    * Detailed balance holds; stationary distribution has the closed form
    * pi_i ∝ prod_{k=1..i} p_{k-1}/q_k. */
  case class BirthDeathChain(q: Array[Double], p: Array[Double]) {
    require(q(0) == 0.0 && p(p.length - 1) == 0.0, "q[0] and p[n-1] must be 0")
    val n: Int = q.length

    lazy val transitionMatrix: DenseMatrix[Double] = {
      val m = DenseMatrix.zeros[Double](n, n)
      for (i <- 0 until n) {
        if (i > 0) m(i, i - 1) = q(i)
        if (i < n - 1) m(i, i + 1) = p(i)
        m(i, i) = 1.0 - q(i) - p(i)
      }
      m
    }

    /** Closed-form stationary distribution. */
    lazy val stationaryDistribution: DenseVector[Double] = {
      val w = new Array[Double](n)
      w(0) = 1.0
      for (i <- 1 until n) w(i) = w(i - 1) * p(i - 1) / q(i)
      val z = w.sum
      DenseVector(w.map(_ / z))
    }

    /** Analytic forward committor A={a} -> B={b}, a < b
      * (birth_death_chain.py `committor_forward`):
      * q+(i) = sum_{k=a..i-1} w_k / sum_{k=a..b-1} w_k with
      * w_a = 1, w_k = prod_{m=a+1..k} q_m/p_m. */
    def committorForward(a: Int, b: Int): DenseVector[Double] = {
      require(a < b)
      val w = new Array[Double](b - a)
      w(0) = 1.0
      for (k <- a + 1 until b) w(k - a) = w(k - a - 1) * q(k) / p(k)
      val z = w.sum
      val out = DenseVector.zeros[Double](n)
      for (i <- a to b) out(i) = w.take(i - a).sum / z
      for (i <- b until n) out(i) = 1.0
      out
    }
  }

  /** Default 5-state birth-death fixture used across specs. */
  def defaultBirthDeath: BirthDeathChain = {
    val p = Array(0.5, 0.4, 0.3, 0.4, 0.0)
    val q = Array(0.0, 0.3, 0.3, 0.2, 0.5)
    BirthDeathChain(q, p)
  }

  /** Discrete double-well MSM (reference data/_double_well.py:25 ships a
    * stored 100-state matrix estimated from Langevin dynamics; we instead
    * BUILD the chain analytically as a Metropolis walk on the double-well
    * potential V(x) = (x^2 - 1)^2 over a uniform grid — same qualitative
    * object: reversible, metastable two-well MSM with known stationary
    * distribution ∝ exp(-beta V), no stored data needed). */
  def doubleWellDiscrete(nStates: Int = 100, beta: Double = 3.0): DenseMatrix[Double] = {
    def v(x: Double) = (x * x - 1.0) * (x * x - 1.0)
    val xs = Array.tabulate(nStates)(i => -2.0 + 4.0 * i / (nStates - 1))
    val m = DenseMatrix.zeros[Double](nStates, nStates)
    for (i <- 0 until nStates) {
      var stay = 1.0
      for (j <- Seq(i - 1, i + 1) if j >= 0 && j < nStates) {
        val acc = math.min(1.0, math.exp(-beta * (v(xs(j)) - v(xs(i)))))
        val pij = 0.5 * acc
        m(i, j) = pij
        stay -= pij
      }
      m(i, i) = stay
    }
    m
  }
}
