package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Random-variate kernels for posterior sampling (replaces the reference's
  * std::gamma/beta distributions in
  * src/include/deeptime/markov/tools/sampler.h). Deterministic given the
  * SplittableRandom stream. */
object RandomVariates {

  /** Marsaglia-Tsang gamma(shape, scale=1); alpha < 1 handled via the
    * boosting identity G(a) = G(a+1) * U^{1/a}. */
  def gamma(rng: java.util.SplittableRandom, shape: Double): Double = {
    if (shape < 1.0) {
      val u = rng.nextDouble()
      gamma(rng, shape + 1.0) * math.pow(u, 1.0 / shape)
    } else {
      val d = shape - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      var result = -1.0
      while (result < 0) {
        var x = 0.0
        var v = 0.0
        do {
          x = rng.nextGaussian()
          v = 1.0 + c * x
        } while (v <= 0)
        v = v * v * v
        val u = rng.nextDouble()
        if (u < 1.0 - 0.0331 * x * x * x * x ||
            math.log(u) < 0.5 * x * x + d * (1.0 - v + math.log(v))) {
          result = d * v
        }
      }
      result
    }
  }

  def beta(rng: java.util.SplittableRandom, a: Double, b: Double): Double = {
    val x = gamma(rng, a)
    val y = gamma(rng, b)
    x / (x + y)
  }

  /** Dirichlet over the positive entries of `alpha`; zeros stay zero. */
  def dirichlet(rng: java.util.SplittableRandom, alpha: Array[Double]): Array[Double] = {
    val out = new Array[Double](alpha.length)
    var s = 0.0
    var i = 0
    while (i < alpha.length) {
      if (alpha(i) > 0) { out(i) = gamma(rng, alpha(i)); s += out(i) }
      i += 1
    }
    if (s > 0) { i = 0; while (i < alpha.length) { out(i) /= s; i += 1 } }
    out
  }
}

/** Posterior transition-matrix samplers (reference
  * estimation/dense/tmat_sampling/tmatrix_sampler.py;
  * sampler_nrev.py Dirichlet rows; sampler.h `RevSampler` Gibbs moves on
  * the unnormalized reversible weights X with x_ij = x_ji). */
object TmatrixSampler {

  /** Non-reversible: rows are independent Dirichlet(c_i1, ..., c_in)
    * ("sparse prior" Z = C - 1, alpha = Z + 1 = C; sampler_nrev.py:14). */
  def sampleNonReversible(counts: DenseMatrix[Double], rng: java.util.SplittableRandom): DenseMatrix[Double] = {
    val n = counts.rows
    val out = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      val row = RandomVariates.dirichlet(rng, Array.tabulate(n)(j => counts(i, j)))
      if (row.sum <= 0) out(i, i) = 1.0
      else for (j <- 0 until n) out(i, j) = row(j)
    }
    out
  }

  /** One update-step of the reversible element sampler: draw a new value for
    * x0 targeting the conditional density
    * x0^(c0-1) (x0+v1)^(-c1) (x0+v2)^(-c2)
    * via a gamma approximation around the mode plus a log-normal random-walk
    * move, each Metropolis-corrected (sampler.h:244 `updateStep`). */
  private def updateStep(rng: java.util.SplittableRandom, v0in: Double, v1: Double,
                         v2: Double, c0: Double, c1: Double, c2: Double): Double = {
    var v0 = v0in
    def positive(x: Double) = x > 0 && !x.isNaN && !x.isInfinite
    def accept(lpOld: Double, lpNew: Double): Boolean = {
      val diff = lpNew - lpOld
      diff > 0 || rng.nextDouble() < math.exp(math.min(diff, 0.0))
    }
    // gamma proposal matched to mode/curvature of the target
    val a = c1 + c2 - c0
    val b = (c1 - c0) * v2 + (c2 - c0) * v1
    val c = -c0 * v1 * v2
    val vbar = 0.5 * (-b + math.sqrt(b * b - 4.0 * a * c)) / a
    val h = c1 / ((vbar + v1) * (vbar + v1)) + c2 / ((vbar + v2) * (vbar + v2)) - c0 / (vbar * vbar)
    val k = -h * vbar * vbar
    val theta = -1.0 / (h * vbar)
    if (positive(k) && positive(theta)) {
      val v0New = RandomVariates.gamma(rng, k) * theta
      if (positive(v0New)) {
        if (v0 == 0) v0 = v0New
        else {
          val lpNew = (c0 - 1.0) * math.log(v0New) - c1 * math.log(v0New + v1) -
            c2 * math.log(v0New + v2) - ((k - 1.0) * math.log(v0New) - v0New / theta)
          val lpOld = (c0 - 1.0) * math.log(v0) - c1 * math.log(v0 + v1) -
            c2 * math.log(v0 + v2) - ((k - 1.0) * math.log(v0) - v0 / theta)
          if (accept(lpOld, lpNew)) v0 = v0New
        }
      }
    }
    // log-normal random walk
    val v0New = v0 * math.exp(rng.nextGaussian())
    if (positive(v0New)) {
      if (v0 == 0) v0 = v0New
      else {
        val lpNew = c0 * math.log(v0New) - c1 * math.log(v0New + v1) - c2 * math.log(v0New + v2)
        val lpOld = c0 * math.log(v0) - c1 * math.log(v0 + v1) - c2 * math.log(v0 + v2)
        if (accept(lpOld, lpNew)) v0 = v0New
      }
    }
    v0
  }

  /** In-place Gibbs sweep(s) over the reversible weight matrix X
    * (sampler.h `RevSampler::update`): beta move on diagonals, updateStep on
    * upper-triangle elements with X kept symmetric; X is renormalized after
    * each sweep. */
  def reversibleSweeps(counts: DenseMatrix[Double], x: DenseMatrix[Double],
                       sweeps: Int, rng: java.util.SplittableRandom): Unit = {
    val n = counts.rows
    val sumC = Array.tabulate(n)(i => bsum(counts(i, ::).t))
    for (_ <- 0 until sweeps) {
      val sumX = Array.tabulate(n)(i => bsum(x(i, ::).t))
      for (i <- 0 until n; j <- i until n if counts(i, j) + counts(j, i) > 0) {
        if (i == j) {
          if (counts(i, i) > 0 && sumC(i) - counts(i, i) > 0) {
            val b = RandomVariates.beta(rng, counts(i, i), sumC(i) - counts(i, i))
            val xNew = b / (1.0 - b) * (sumX(i) - x(i, i))
            if (xNew > 0 && !xNew.isNaN && !xNew.isInfinite) {
              sumX(i) += xNew - x(i, i)
              x(i, i) = xNew
            }
          }
        } else {
          val rest1 = sumX(i) - x(i, j)
          val rest2 = sumX(j) - x(j, i)
          val xNew = updateStep(rng, x(i, j), rest1, rest2,
            counts(i, j) + counts(j, i), sumC(i), sumC(j))
          x(i, j) = xNew; x(j, i) = xNew
          sumX(i) = rest1 + xNew
          sumX(j) = rest2 + xNew
        }
      }
      val z = bsum(x)
      if (z > 0) x :*= 1.0 / z
    }
  }

  // --- fixed-π reversible sampler (reference sampler_revpi.py driver +
  // sampler.h:23 `RevPiSampler`): Gibbs moves on the joint matrix
  // X_ij = π_i P_ij with X symmetric (reversibility) and every row sum
  // PINNED at π_i — each move changes one off-diagonal pair (k,l) and
  // compensates on both diagonals, so π is held exactly by construction.
  // Per pair the conditional density of v = x_kl/(s2 - x_kl) (s2 the
  // smaller of the two pinned row budgets) is
  //   v^a1 (r+v)^a3 (1+v)^-(a1+a2+a3+2),  r = s/(s-1), s = s3/s2,
  // sampled by a mode-matched gamma proposal plus a log-normal random
  // walk, each Metropolis-corrected. Two deliberate deviations from the
  // C++ (documented, both on the side of correctness): the pair filter is
  // the symmetric C_kl + C_lk > 0 (sampler.h:42 tests C(k,l)+C(k,l),
  // skipping pairs observed only as l->k, while the Python wrapper's own
  // index arrays use the symmetric form — sampler_revpi.py:56), and the
  // random-walk acceptance uses log((1+w)/(1+v)) (sampler.h:108 has
  // (2+w), which is not the Jacobian-corrected MH ratio for the
  // log-normal proposal). Bit-parity with std::mt19937 is not attempted;
  // parity is distributional, as with the other samplers here.

  private def positiveFinite(x: Double): Boolean =
    x > 0 && !x.isNaN && !x.isInfinite

  /** Mode of the conditional density (sampler.h:71 `maximum_point`). */
  private def revPiMode(s: Double, a1: Double, a2: Double, a3: Double): Double = {
    val a = a2 + 1.0
    val b = a2 - a1 + (a2 + a3 + 1.0) / (s - 1.0)
    val c = (a1 + 1.0) * s / (1.0 - s)
    (-b + math.sqrt(b * b - 4.0 * a * c)) / (2.0 * a)
  }

  /** Second derivative of the log-density at v (sampler.h:91 `DF`). */
  private def revPiD2(v: Double, s: Double, a1: Double, a2: Double, a3: Double): Double = {
    val r = s / (s - 1.0)
    -(a1 + 1.0) / (v * v) - a3 / ((r + v) * (r + v)) +
      (a1 + a2 + a3 + 2.0) / ((1.0 + v) * (1.0 + v))
  }

  /** One Metropolis move on x_kl: gamma proposal when rw=false
    * (sampler.h:111 `sample_quad`), log-normal random walk when rw=true
    * (sampler.h:179 `sample_quad_rw`). Returns the (possibly unchanged)
    * new x_kl; never exceeds min(x_kk + x_kl, x_ll + x_kl), so both
    * compensating diagonals stay positive. */
  private def samplePairMove(rng: java.util.SplittableRandom, rw: Boolean,
                             xkl: Double, xkk: Double, xll: Double,
                             ckl: Double, clk: Double, ckk: Double, cll: Double,
                             bk: Double, bl: Double): Double = {
    val skl = xkk + xkl
    val slk = xll + xkl
    val a1 = ckl + clk - 1.0
    val (s2, s3, a2, a3) =
      if (skl <= slk) (skl, slk, ckk + bk - 1.0, cll + bl - 1.0)
      else (slk, skl, cll + bl - 1.0, ckk + bk - 1.0)
    val s = s3 / s2
    if (!positiveFinite(s2 - xkl)) return xkl
    val v = xkl / (s2 - xkl)
    val r = s / (s - 1.0)
    if (rw) {
      val w = v * math.exp(rng.nextGaussian())
      if (!positiveFinite(w)) return xkl
      if (!positiveFinite(v)) return s2 * w / (1.0 + w)
      val q = (a1 + 1.0) * math.log(w / v) + a3 * math.log((r + w) / (r + v)) -
        (a1 + a2 + a3 + 2.0) * math.log((1.0 + w) / (1.0 + v))
      if (math.log(rng.nextDouble()) < math.min(0.0, q)) s2 * w / (1.0 + w) else xkl
    } else {
      if (!positiveFinite(s - 1.0)) return xkl
      val vbar = revPiMode(s, a1, a2, a3)
      val beta = -revPiD2(vbar, s, a1, a2, a3) * vbar
      val alpha = beta * vbar
      if (!(positiveFinite(alpha) && positiveFinite(1.0 / beta))) return xkl
      val w = RandomVariates.gamma(rng, alpha) / beta
      if (!positiveFinite(w)) return xkl
      if (!positiveFinite(v)) return s2 * w / (1.0 + w)
      val q = beta * (w - v) + (a1 + 1.0 - alpha) * math.log(w / v) +
        a3 * math.log((r + w) / (r + v)) -
        (a1 + a2 + a3 + 2.0) * math.log((1.0 + w) / (1.0 + v))
      if (math.log(rng.nextDouble()) < math.min(0.0, q)) s2 * w / (1.0 + w) else xkl
    }
  }

  /** In-place Gibbs sweep(s) over X with fixed row sums (= π): for every
    * unordered pair with symmetric counts, one gamma move then one
    * random-walk move, each updating X(k,l)=X(l,k) and compensating both
    * diagonals (sampler.h:33 `RevPiSampler::update`). */
  def revPiSweeps(counts: DenseMatrix[Double], x: DenseMatrix[Double],
                  b: Array[Double], sweeps: Int,
                  rng: java.util.SplittableRandom): Unit = {
    val n = counts.rows
    for (_ <- 0 until sweeps; k <- 0 until n; l <- 0 until k
         if counts(k, l) + counts(l, k) > 0) {
      var move = 0
      while (move < 2) {
        val xkl = x(k, l)
        val xNew = samplePairMove(rng, rw = move == 1, xkl, x(k, k), x(l, l),
          counts(k, l), counts(l, k), counts(k, k), counts(l, l), b(k), b(l))
        x(k, l) = xNew
        x(l, k) = xNew
        x(k, k) += xkl - xNew
        x(l, l) += xkl - xNew
        move += 1
      }
    }
  }

  /** Draw reversible transition-matrix samples with the stationary vector
    * FIXED at `pi` (reference sampler_revpi.py `SamplerRevPi`): initial
    * state X = diag(π)·P0 with P0 the fixed-π MLE of a diagonally
    * regularized count matrix (every c_ii=0 gets +1 so P0's diagonal is
    * positive), diagonal prior b_i = eps where c_ii≈0 (upgraded to 1.0
    * where the un-regularized fixed-π MLE still has p_ii>0), then
    * `nSteps` sweeps between samples. Every returned P is exactly
    * stationary and reversible w.r.t. π. */
  def sampleReversibleFixedPi(counts: DenseMatrix[Double], pi: DenseVector[Double],
                              nSamples: Int, seed: Long, nSteps: Int = -1,
                              burnIn: Int = 10, eps: Double = 0.1): Seq[DenseMatrix[Double]] = {
    val n = counts.rows
    require(pi.length == n, s"pi has ${pi.length} entries for a $n-state count matrix")
    require((0 until n).forall(i => (0 until n).forall(j => counts(i, j) >= 0)),
      "count matrix contains negative elements")
    val piN = pi / bsum(pi)
    // heuristic from _bayesian_msm.py:253 — sqrt(n) decorrelation sweeps
    val steps = if (nSteps > 0) nSteps else math.max(1, math.sqrt(n).toInt)
    val rng = new java.util.SplittableRandom(seed)
    val pMle = graft.markov.MsmAnalysis.reversibleMleFixedPi(counts, piN)
    val reg = counts.copy
    for (i <- 0 until n if counts(i, i) == 0.0) reg(i, i) = 1.0
    val p0 = graft.markov.MsmAnalysis.reversibleMleFixedPi(reg, piN)
    val b = Array.tabulate(n) { i =>
      if (math.abs(counts(i, i)) < 1e-12) { if (pMle(i, i) > 0.0) 1.0 else eps }
      else 0.0
    }
    val x = DenseMatrix.tabulate(n, n)((i, j) => piN(i) * p0(i, j))
    x :*= 1.0 / bsum(x)
    revPiSweeps(counts, x, b, burnIn, rng)
    (0 until nSamples).map { _ =>
      revPiSweeps(counts, x, b, steps, rng)
      DenseMatrix.tabulate(n, n)((i, j) => x(i, j) / piN(i))
    }
  }

  /** Draw reversible transition-matrix samples. Returns row-stochastic
    * matrices T_ij = x_ij / x_i. */
  def sampleReversible(counts: DenseMatrix[Double], nSamples: Int, seed: Long,
                       nSteps: Int = -1, burnIn: Int = 10): Seq[DenseMatrix[Double]] = {
    val n = counts.rows
    val steps = if (nSteps > 0) nSteps else math.max(1, math.sqrt(n).toInt)
    val rng = new java.util.SplittableRandom(seed)
    // init at (a few iterations of) the reversible MLE, as the reference does
    val p0 = TransitionMatrixMle.reversible(counts, maxIter = 100)
    val pi0 = graft.linalg.LinAlg.stationaryDistribution(p0)
    val x = DenseMatrix.tabulate(n, n)((i, j) => pi0(i) * p0(i, j))
    reversibleSweeps(counts, x, burnIn, rng)
    (0 until nSamples).map { _ =>
      reversibleSweeps(counts, x, steps, rng)
      val t = DenseMatrix.zeros[Double](n, n)
      for (i <- 0 until n) {
        val xi = bsum(x(i, ::).t)
        if (xi > 0) for (j <- 0 until n) t(i, j) = x(i, j) / xi
        else t(i, i) = 1.0
      }
      t
    }
  }
}

/** Bayesian MSM (reference markov/msm/_bayesian_msm.py:176-353): posterior
  * over transition matrices given effective counts, with summary statistics
  * over derived quantities.
  *
  * Distributed shape: the data-sized work (effective counts) is Spark jobs;
  * the posterior chains run as PARALLEL SEEDED TASKS — `nChains` independent
  * Gibbs chains, each a few KB of state, fanned out with one task per chain
  * and merged by collect. Sample count per chain = nSamples / nChains. */
object BayesianMsm {

  case class BayesianPosterior(prior: MarkovStateModel,
                               samples: Seq[MarkovStateModel]) {
    /** Gather a scalar statistic over samples: (mean, std, lower/upper CI). */
    def gather(f: MarkovStateModel => Double, conf: Double = 0.95): (Double, Double, Double, Double) = {
      val vals = samples.map(f)
      val mean = vals.sum / vals.size
      val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / math.max(1, vals.size - 1))
      val (lo, hi) = graft.util.Stats.confidenceInterval(vals, conf)
      (mean, std, lo, hi)
    }

    /** Generic statistics facade over an arbitrary (vector-valued) model
      * quantity — mean / population std / mean-anchored CI per element
      * (util/stats.py:197-290 `QuantityStatistics.gather`). */
    def gatherStats(f: MarkovStateModel => Array[Double], quantity: String = "",
                    conf: Double = 0.95): graft.util.QuantityStatistics =
      graft.util.QuantityStatistics.gather(samples, f, quantity, conf)

    /** Timescale statistics per process: rows (process, mean, std, lo, hi). */
    def timescaleStats(k: Int, conf: Double = 0.95): Seq[(Int, Double, Double, Double, Double)] =
      (0 until k).map { p =>
        val (m, s, lo, hi) = gather(msm => {
          val ts = msm.timescales(k)
          if (p < ts.length) ts(p) else Double.NaN
        }, conf)
        (p, m, s, lo, hi)
      }
  }

  /** Fit from a dtraj frame: effective counts -> largest SCC -> MLE prior +
    * posterior samples (chains distributed over the cluster).
    *
    * `piConstraint` (reference `_bayesian_msm.py:132-163`
    * `stationary_distribution_constraint`): a stationary vector over the
    * FULL `nStates` state set; the prior becomes the fixed-π reversible
    * MLE and sampling uses the fixed-π Gibbs sampler, with π restricted
    * to the largest connected set and renormalized (the reference passes
    * `prior.stationary_distribution` on the active set). Requires
    * `reversible` (the reference raises for nonreversible + mu). */
  def fit(dtraj: DataFrame, tau: Int, nStates: Int, nSamples: Int = 100,
          reversible: Boolean = true, seed: Long = 42L, nChains: Int = 8,
          useEffectiveCounts: Boolean = true, maxLag: Int = 100,
          piConstraint: Option[Array[Double]] = None): BayesianPosterior = {
    val spark = dtraj.sparkSession
    val counts =
      if (useEffectiveCounts) EffectiveCounts.effectiveCountMatrix(dtraj, tau, nStates, maxLag = maxLag)
      else TransitionCounting.toDense(TransitionCounting.slidingCounts(dtraj, tau), nStates)
    val lcs = Connectivity.largestConnectedSet(counts)
    val sub = Connectivity.submatrix(counts, lcs)
    val piSub = piConstraint.map { p =>
      require(p.length == nStates,
        s"piConstraint has ${p.length} entries for $nStates states")
      val restricted = lcs.map(p(_))
      val z = restricted.sum
      require(z > 0, "piConstraint is zero on the largest connected set")
      restricted.map(_ / z)
    }
    fromCounts(spark, sub, tau, lcs, nSamples, reversible, seed, nChains, piSub)
  }

  /** One seeded Gibbs chain's samples as flat matrices (shared by the
    * distributed fan-out and the driver-local battery path; identical
    * seeding keeps the two bit-equal). */
  private def chainSamples(flatCounts: Array[Double], n: Int, chainId: Long,
                           perChain: Int, reversible: Boolean,
                           seed: Long, piOpt: Option[Array[Double]]): Seq[Array[Double]] = {
    val rng = new java.util.SplittableRandom(seed ^ (chainId * 0x9E3779B97F4A7C15L))
    val c = graft.linalg.LinAlg.fromFlat(flatCounts, n)
    val mats = piOpt match {
      case Some(p) =>
        TmatrixSampler.sampleReversibleFixedPi(c, DenseVector(p), perChain, rng.nextLong())
      case None if reversible =>
        TmatrixSampler.sampleReversible(c, perChain, rng.nextLong())
      case None =>
        Seq.fill(perChain)(TmatrixSampler.sampleNonReversible(c, rng))
    }
    mats.map(graft.linalg.LinAlg.toFlat)
  }

  private def toPosterior(prior: MarkovStateModel, sampleRows: Seq[Array[Double]],
                          n: Int, tau: Int, states: Array[Int]): BayesianPosterior =
    BayesianPosterior(prior, sampleRows.map(f =>
      MarkovStateModel(graft.linalg.LinAlg.fromFlat(f, n), tau, states)))

  private def priorOf(counts: DenseMatrix[Double], tau: Int, states: Array[Int],
                      reversible: Boolean, piOpt: Option[Array[Double]]): MarkovStateModel =
    MarkovStateModel(piOpt match {
      case Some(p) =>
        require(reversible,
          "non-reversible sampling with fixed stationary vector not implemented (reference tmatrix_sampler.py:47)")
        graft.markov.MsmAnalysis.reversibleMleFixedPi(counts, DenseVector(p))
      case None if reversible => TransitionMatrixMle.reversible(counts)
      case None => TransitionMatrixMle.nonReversible(counts)
    }, tau, states)

  def fromCounts(spark: SparkSession, counts: DenseMatrix[Double], tau: Int,
                 states: Array[Int], nSamples: Int, reversible: Boolean,
                 seed: Long, nChains: Int,
                 piConstraint: Option[Array[Double]] = None): BayesianPosterior = {
    import spark.implicits._
    val prior = priorOf(counts, tau, states, reversible, piConstraint)
    val n = counts.rows
    val flatCounts = graft.linalg.LinAlg.toFlat(counts)
    val chains = math.max(1, math.min(nChains, nSamples))
    val perChain = (nSamples + chains - 1) / chains
    val rev = reversible
    val piC = piConstraint
    val sampleRows: Seq[Array[Double]] = spark.range(chains).as[Long]
      .flatMap(chainId => chainSamples(flatCounts, n, chainId, perChain, rev, seed, piC))
      .collect().toSeq.take(nSamples)
    toPosterior(prior, sampleRows, n, tau, states)
  }

  /** Driver-local twin of `fromCounts` (identical chain seeding, so the
    * posterior is bit-equal): for model-sized batteries where fanning four
    * few-KB chains out as a Spark job costs more scheduler time than the
    * Gibbs sweeps themselves. The distributed path remains for real
    * many-chain posteriors. */
  def fromCountsLocal(counts: DenseMatrix[Double], tau: Int, states: Array[Int],
                      nSamples: Int, reversible: Boolean, seed: Long,
                      nChains: Int,
                      piConstraint: Option[Array[Double]] = None): BayesianPosterior = {
    val prior = priorOf(counts, tau, states, reversible, piConstraint)
    val n = counts.rows
    val flatCounts = graft.linalg.LinAlg.toFlat(counts)
    val chains = math.max(1, math.min(nChains, nSamples))
    val perChain = (nSamples + chains - 1) / chains
    val sampleRows = (0L until chains.toLong)
      .flatMap(chainId => chainSamples(flatCounts, n, chainId, perChain, reversible, seed, piConstraint))
      .take(nSamples)
    toPosterior(prior, sampleRows, n, tau, states)
  }
}
