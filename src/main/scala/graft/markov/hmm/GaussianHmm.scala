package graft.markov.hmm

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.apache.spark.sql.{DataFrame, Dataset}
import graft.markov.TransitionMatrixMle

/** Hidden Markov model with 1-d Gaussian output densities (reference
  * markov/hmm/_output_model.py:308 `GaussianOutputModel`,
  * init/gaussian/_init_gaussian_impl.py, Baum-Welch loop of
  * _maximum_likelihood_hmm.py).
  *
  * Distributed shape mirrors discrete `Hmm`: EM on the driver; per
  * iteration ONE pass where each trajectory runs scaled forward-backward
  * locally and emits O(m^2 + m) sufficient statistics — for the Gaussian
  * M-step these are the gamma-weighted moments (sum g, sum g*o, sum g*o^2)
  * per hidden state, so means/sigmas update without materializing gamma. */
object GaussianHmm {

  case class GaussianHmmModel(
      transition: DenseMatrix[Double],  // m x m
      means: Array[Double], sigmas: Array[Double],
      initial: DenseVector[Double],
      logLikelihood: Double, iterations: Int)

  private case class GStats(loglik: Double, xi: Array[Double],
                            gw: Array[Double], gwx: Array[Double], gwxx: Array[Double],
                            g0: Array[Double]) {
    def merge(o: GStats): GStats = {
      def add(a: Array[Double], b: Array[Double]): Array[Double] = {
        val r = a.clone; var i = 0
        while (i < r.length) { r(i) += b(i); i += 1 }
        r
      }
      GStats(loglik + o.loglik, add(xi, o.xi), add(gw, o.gw),
        add(gwx, o.gwx), add(gwxx, o.gwxx), add(g0, o.g0))
    }
  }

  @inline private def gaussPdf(x: Double, mu: Double, sigma: Double): Double = {
    val s = math.max(sigma, 1e-8)
    val z = (x - mu) / s
    math.exp(-0.5 * z * z) / (s * math.sqrt(2.0 * math.Pi))
  }

  /** Scaled forward-backward on a per-frame likelihood matrix
    * lik(t*m + j) = p(o_t | state j); emits gamma-weighted moments. */
  private def forwardBackward(obs: Array[Double], a: Array[Double], pi: Array[Double],
                              means: Array[Double], sigmas: Array[Double], m: Int): GStats = {
    val tLen = obs.length
    val lik = new Array[Double](tLen * m)
    var t = 0
    while (t < tLen) {
      var j = 0
      var rowMax = 0.0
      while (j < m) {
        val v = gaussPdf(obs(t), means(j), sigmas(j))
        lik(t * m + j) = v
        if (v > rowMax) rowMax = v
        j += 1
      }
      // outlier guard (_output_model.py ignore_outliers): if every state
      // assigns ~zero likelihood, flatten the row to uniform
      if (rowMax < 1e-300) { j = 0; while (j < m) { lik(t * m + j) = 1.0; j += 1 } }
      t += 1
    }
    val alpha = Array.ofDim[Double](tLen, m)
    val beta = Array.ofDim[Double](tLen, m)
    val scale = new Array[Double](tLen)
    var s0 = 0.0
    var i = 0
    while (i < m) { alpha(0)(i) = pi(i) * lik(i); s0 += alpha(0)(i); i += 1 }
    scale(0) = if (s0 > 0) s0 else 1e-300
    i = 0; while (i < m) { alpha(0)(i) /= scale(0); i += 1 }
    t = 1
    while (t < tLen) {
      var st = 0.0
      var j = 0
      while (j < m) {
        var acc = 0.0
        var k = 0
        while (k < m) { acc += alpha(t - 1)(k) * a(k * m + j); k += 1 }
        val v = acc * lik(t * m + j)
        alpha(t)(j) = v; st += v
        j += 1
      }
      scale(t) = if (st > 0) st else 1e-300
      j = 0; while (j < m) { alpha(t)(j) /= scale(t); j += 1 }
      t += 1
    }
    i = 0; while (i < m) { beta(tLen - 1)(i) = 1.0 / scale(tLen - 1); i += 1 }
    t = tLen - 2
    while (t >= 0) {
      var k = 0
      while (k < m) {
        var acc = 0.0
        var j = 0
        while (j < m) { acc += a(k * m + j) * lik((t + 1) * m + j) * beta(t + 1)(j); j += 1 }
        beta(t)(k) = acc / scale(t)
        k += 1
      }
      t -= 1
    }
    val xi = new Array[Double](m * m)
    val gw = new Array[Double](m)
    val gwx = new Array[Double](m)
    val gwxx = new Array[Double](m)
    val g0 = new Array[Double](m)
    t = 0
    while (t < tLen) {
      var z = 0.0
      var j = 0
      while (j < m) { z += alpha(t)(j) * beta(t)(j) * scale(t); j += 1 }
      if (z <= 0) z = 1.0
      j = 0
      while (j < m) {
        val g = alpha(t)(j) * beta(t)(j) * scale(t) / z
        gw(j) += g
        gwx(j) += g * obs(t)
        gwxx(j) += g * obs(t) * obs(t)
        if (t == 0) g0(j) = g
        j += 1
      }
      t += 1
    }
    t = 0
    while (t < tLen - 1) {
      var k = 0
      while (k < m) {
        var j = 0
        while (j < m) {
          xi(k * m + j) += alpha(t)(k) * a(k * m + j) * lik((t + 1) * m + j) * beta(t + 1)(j)
          j += 1
        }
        k += 1
      }
      t += 1
    }
    GStats(scale.map(math.log).sum, xi, gw, gwx, gwxx, g0)
  }

  private def trajectories(traj: DataFrame, valueCol: String): Dataset[(Long, Array[Double])] = {
    val spark = traj.sparkSession
    import spark.implicits._
    traj.selectExpr("traj_id", "t", s"CAST($valueCol AS DOUBLE) AS v")
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (id, it) => (id, it.toArray.sortBy(_._2).map(_._3)) }
  }

  /** Deterministic initial guess: means at evenly spaced quantiles of the
    * pooled observations (stands in for the reference's GMM init — same
    * role, deterministic), sigmas = pooled std / m, uniform chain. */
  def initialGuess(traj: DataFrame, nHidden: Int, valueCol: String): GaussianHmmModel = {
    val m = nHidden
    val probs = (1 to m).map(i => i.toDouble / (m + 1)).toArray
    val qs = traj.selectExpr(s"CAST($valueCol AS DOUBLE) AS v")
      .stat.approxQuantile("v", probs, 1e-3)
    val stats = traj.selectExpr(s"avg($valueCol) AS mu", s"stddev_pop($valueCol) AS sd").collect()(0)
    val sd = stats.getDouble(1)
    val a = DenseMatrix.fill[Double](m, m)(0.1 / math.max(1, m - 1))
    (0 until m).foreach(i => a(i, i) = 0.9)
    GaussianHmmModel(a, qs, Array.fill(m)(math.max(sd / m, 1e-3)),
      DenseVector.fill(m)(1.0 / m), Double.NegativeInfinity, 0)
  }

  /** Baum-Welch EM over (traj_id, t, value) observations. */
  def fit(traj: DataFrame, nHidden: Int, valueCol: String = "value",
          maxIter: Int = 100, tol: Double = 1e-6,
          reversible: Boolean = true): GaussianHmmModel = {
    val spark = traj.sparkSession
    import spark.implicits._
    var model = initialGuess(traj, nHidden, valueCol)
    val m = nHidden
    val trajs = trajectories(traj, valueCol).cache()
    var lastLl = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val a = graft.linalg.LinAlg.toFlat(model.transition)
      val pi = model.initial.toArray
      val means = model.means; val sigmas = model.sigmas
      val stats = trajs
        .map { case (_, obs) => forwardBackward(obs, a, pi, means, sigmas, m) }
        .reduce((x, y) => x.merge(y))
      val xiM = graft.linalg.LinAlg.fromFlat(stats.xi, m)
      val aNew = if (reversible) TransitionMatrixMle.reversible(xiM)
                 else TransitionMatrixMle.nonReversible(xiM)
      val meansNew = new Array[Double](m)
      val sigmasNew = new Array[Double](m)
      for (j <- 0 until m) {
        val w = stats.gw(j)
        if (w > 1e-12) {
          meansNew(j) = stats.gwx(j) / w
          val v = stats.gwxx(j) / w - meansNew(j) * meansNew(j)
          sigmasNew(j) = math.sqrt(math.max(v, 1e-12))
        } else { meansNew(j) = model.means(j); sigmasNew(j) = model.sigmas(j) }
      }
      val piSum = stats.g0.sum
      val piNew = DenseVector(stats.g0.map(v => if (piSum > 0) v / piSum else 1.0 / m))
      converged = math.abs(stats.loglik - lastLl) < tol * math.abs(stats.loglik)
      lastLl = stats.loglik
      model = GaussianHmmModel(aNew, meansNew, sigmasNew, piNew, stats.loglik, iter + 1)
      iter += 1
    }
    trajs.unpersist()
    model
  }

  /** Viterbi decode per frame: (traj_id, t, hidden). */
  def viterbi(traj: DataFrame, model: GaussianHmmModel, valueCol: String = "value"): DataFrame = {
    val spark = traj.sparkSession
    import spark.implicits._
    val m = model.transition.rows
    val a = graft.linalg.LinAlg.toFlat(model.transition)
    val pi = model.initial.toArray
    val means = model.means; val sigmas = model.sigmas
    traj.selectExpr("traj_id", "t", s"CAST($valueCol AS DOUBLE) AS v")
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        val rows = it.toArray.sortBy(_._2)
        val obs = rows.map(_._3)
        val tLen = obs.length
        val logA = a.map(v => math.log(math.max(v, 1e-300)))
        val delta = Array.ofDim[Double](tLen, m)
        val psi = Array.ofDim[Int](tLen, m)
        var i = 0
        while (i < m) {
          delta(0)(i) = math.log(math.max(pi(i), 1e-300)) +
            math.log(math.max(gaussPdf(obs(0), means(i), sigmas(i)), 1e-300))
          i += 1
        }
        var t = 1
        while (t < tLen) {
          var j = 0
          while (j < m) {
            var best = Double.NegativeInfinity; var arg = 0
            var k = 0
            while (k < m) {
              val v = delta(t - 1)(k) + logA(k * m + j)
              if (v > best) { best = v; arg = k }
              k += 1
            }
            delta(t)(j) = best + math.log(math.max(gaussPdf(obs(t), means(j), sigmas(j)), 1e-300))
            psi(t)(j) = arg
            j += 1
          }
          t += 1
        }
        val path = new Array[Int](tLen)
        path(tLen - 1) = (0 until m).maxBy(delta(tLen - 1)(_))
        t = tLen - 2
        while (t >= 0) { path(t) = psi(t + 1)(path(t + 1)); t -= 1 }
        rows.iterator.zip(path.iterator).map { case ((_, tt, _), h) => (id, tt, h) }
      }
      .toDF("traj_id", "t", "hidden")
  }

  /** Generate synthetic observations from a hidden path + output model
    * (GaussianOutputModel.generate_observation_trajectory). */
  def generate(spark: org.apache.spark.sql.SparkSession, model: GaussianHmmModel,
               nTraj: Int, length: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val a = graft.linalg.LinAlg.toFlat(model.transition)
    val m = model.transition.rows
    val pi = model.initial.toArray
    val means = model.means; val sigmas = model.sigmas
    spark.range(nTraj.toLong).as[Long]
      .flatMap { id =>
        val rng = new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L))
        var s = {
          val u = rng.nextDouble(); var acc = 0.0; var i = 0; var r = m - 1
          var found = false
          while (i < m && !found) { acc += pi(i); if (u < acc) { r = i; found = true }; i += 1 }
          r
        }
        (0 until length).iterator.map { t =>
          val o = means(s) + sigmas(s) * rng.nextGaussian()
          val out = (id, t.toLong, s, o)
          // advance chain
          val u = rng.nextDouble(); var acc = 0.0; var j = 0; var next = m - 1
          var found = false
          while (j < m && !found) { acc += a(s * m + j); if (u < acc) { next = j; found = true }; j += 1 }
          s = next
          out
        }
      }
      .toDF("traj_id", "t", "hidden_true", "value")
  }
}
