package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.linalg.LinAlg

/** MSM analysis long tail (reference markov/tools/analysis/_api.py:446-1198,
  * _fingerprints.py, dense/_hitting_probability.py,
  * dense/_correlations.py, estimation/dense/ratematrix.py + mle_trev.h).
  * All driver-side on n x n model matrices. */
object MsmAnalysis {

  /** RDL decomposition with 'reversible' norm (analysis/_decomposition.py
    * rdl_decomposition_rev): T reversible w.r.t. pi is symmetrized to
    * S = D^{1/2} T D^{-1/2} (D = diag(pi)); eigSym gives orthonormal W, and
    * R = D^{-1/2} W, L = W^T D^{1/2} with L[0,:] = pi, R[:,0] = 1.
    * Returns (R, eigenvalues desc, L) with L R = I. */
  def rdlReversible(t: DenseMatrix[Double], piOpt: Option[DenseVector[Double]] = None,
                    k: Int = -1): (DenseMatrix[Double], DenseVector[Double], DenseMatrix[Double]) = {
    val n = t.rows
    val pi = piOpt.getOrElse(LinAlg.stationaryDistribution(t))
    val sqrtPi = DenseVector.tabulate(n)(i => math.sqrt(math.max(pi(i), 1e-300)))
    val s = DenseMatrix.tabulate(n, n)((i, j) => sqrtPi(i) * t(i, j) / sqrtPi(j))
    val es = breeze.linalg.eigSym(LinAlg.sym(s))
    val (vals, w) = LinAlg.sortEigs(es.eigenvalues, es.eigenvectors, byMagnitude = true)
    val kk = if (k > 0) math.min(k, n) else n
    val r = DenseMatrix.tabulate(n, kk)((i, j) => w(i, j) / sqrtPi(i))
    val l = DenseMatrix.tabulate(kk, n)((i, j) => w(j, i) * sqrtPi(j))
    // sign convention: R[:,0] = 1, L[0,:] = pi
    for (j <- 0 until kk) {
      val sgn = math.signum(bsum(l(j, ::).t))
      if (sgn < 0) { r(::, j) :*= -1.0; l(j, ::) :*= -1.0 }
    }
    // normalize first pair exactly
    val scale0 = r(0, 0)
    if (math.abs(scale0) > 1e-300) { r(::, 0) :/= scale0; l(0, ::) :*= scale0 }
    (r, vals(0 until kk).copy, l)
  }

  /** RDL decomposition with 'standard' norm for general (possibly
    * non-reversible) matrices with a REAL spectrum
    * (analysis/_decomposition.py:263 `rdl_decomposition_nrev`): right
    * eigenvectors from eig, left rows from the inverse, normalized so
    * L R = I, L[0,:] ~ stationary distribution, R[:,0] = 1. */
  def rdlNonReversible(t: DenseMatrix[Double], k: Int = -1): (DenseMatrix[Double], DenseVector[Double], DenseMatrix[Double]) = {
    val n = t.rows
    val e = breeze.linalg.eig(t)
    val order = (0 until n).sortBy(i => -math.hypot(e.eigenvalues(i), e.eigenvaluesComplex(i)))
    require(order.forall(i => math.abs(e.eigenvaluesComplex(i)) < 1e-10),
      "rdlNonReversible requires a real spectrum; use eigenvaluesComplex for complex pairs")
    // the (1, pi) normalization needs a UNIQUE Perron eigenvalue: reducible
    // chains (two eigenvalues at 1) or periodic ones (-1 at modulus 1)
    // would silently divide by a near-zero row sum
    require(math.abs(e.eigenvalues(order.head) - 1.0) < 1e-8,
      "leading eigenvalue is not 1; not a transition matrix?")
    require(n == 1 || math.hypot(e.eigenvalues(order(1)),
      e.eigenvaluesComplex(order(1))) < 1.0 - 1e-10,
      "non-unique modulus-1 eigenvalue (reducible or periodic chain); " +
        "restrict to the largest connected set first")
    val r = DenseMatrix.zeros[Double](n, n)
    order.zipWithIndex.foreach { case (src, dst) => r(::, dst) := e.eigenvectors(::, src) }
    val l = breeze.linalg.inv(r)
    // normalize: first pair to (1, pi)
    val s0 = bsum(l(0, ::).t)
    l(0, ::) :/= s0
    r(::, 0) :*= s0
    val vals = DenseVector(order.map(e.eigenvalues(_)).toArray)
    val kk = if (k > 0) math.min(k, n) else n
    (r(::, 0 until kk).copy, vals(0 until kk).copy, l(0 until kk, ::).copy)
  }

  /** Stationary time cross-correlation E_pi[obs1(x_0) obs2(x_t)] for each
    * t in `times` (dense/_correlations.py:107 time_correlations_direct —
    * iterative vec-matrix products, valid for non-reversible T). */
  def correlation(t: DenseMatrix[Double], obs1: DenseVector[Double],
                  obs2: DenseVector[Double], times: Seq[Int],
                  piOpt: Option[DenseVector[Double]] = None): Seq[Double] = {
    val pi = piOpt.getOrElse(LinAlg.stationaryDistribution(t))
    val l = DenseVector.tabulate(t.rows)(i => pi(i) * obs1(i))
    propagatedDots(t, l, obs2, times)
  }

  /** Relaxation experiment <p0 | T^t | obs> (time_relaxations_direct). */
  def relaxation(t: DenseMatrix[Double], p0: DenseVector[Double],
                 obs: DenseVector[Double], times: Seq[Int]): Seq[Double] =
    propagatedDots(t, p0, obs, times)

  /** Shared: for each time k in sorted order, (left^T T^k) dot right. */
  private def propagatedDots(t: DenseMatrix[Double], left: DenseVector[Double],
                             right: DenseVector[Double], times: Seq[Int]): Seq[Double] = {
    val sorted = times.zipWithIndex.sortBy(_._1)
    val out = new Array[Double](times.length)
    var cur = left.copy
    var curTime = 0
    sorted.foreach { case (time, origIdx) =>
      while (curTime < time) { cur = t.t * cur; curTime += 1 }
      out(origIdx) = cur dot right
    }
    out.toSeq
  }

  /** Dynamical fingerprint (analysis/_fingerprints.py:89): timescales and
    * amplitudes a_i = <w obs1, r_i> <l_i, obs2> with w = mu (correlation)
    * or p0 (relaxation). Reversible T. */
  def fingerprint(t: DenseMatrix[Double], obs1: DenseVector[Double],
                  obs2: DenseVector[Double], p0: Option[DenseVector[Double]] = None,
                  tau: Double = 1.0, k: Int = -1): (Seq[Double], Seq[Double]) = {
    val (r, vals, l) = rdlReversible(t, None, k)
    val mu = l(0, ::).t
    val w = p0.getOrElse(mu)
    val kk = vals.length
    val wObs1 = DenseVector.tabulate(t.rows)(i => w(i) * obs1(i))
    val amplitudes = (0 until kk).map(i => (wObs1 dot r(::, i)) * (l(i, ::).t dot obs2))
    val timescales = LinAlg.timescales(vals.toArray.toSeq, tau)
    (timescales, amplitudes)
  }

  def fingerprintCorrelation(t: DenseMatrix[Double], obs1: DenseVector[Double],
                             obs2: DenseVector[Double], tau: Double = 1.0,
                             k: Int = -1): (Seq[Double], Seq[Double]) =
    fingerprint(t, obs1, obs2, None, tau, k)

  def fingerprintRelaxation(t: DenseMatrix[Double], p0: DenseVector[Double],
                            obs: DenseVector[Double], tau: Double = 1.0,
                            k: Int = -1): (Seq[Double], Seq[Double]) =
    fingerprint(t, DenseVector.ones[Double](t.rows), obs, Some(p0), tau, k)

  /** Expected transition counts after N steps from p0 (_api.py:758):
    * E[C^(N)] = diag(sum_{k<N} p0^T T^k) T. */
  def expectedCounts(t: DenseMatrix[Double], p0: DenseVector[Double], n: Int): DenseMatrix[Double] = {
    val acc = DenseVector.zeros[Double](t.rows)
    var p = p0.copy
    var k = 0
    while (k < n) { acc += p; p = t.t * p; k += 1 }
    DenseMatrix.tabulate(t.rows, t.rows)((i, j) => acc(i) * t(i, j))
  }

  /** Stationary expected counts E[C^(N)] = N diag(pi) T (_api.py:807). */
  def expectedCountsStationary(t: DenseMatrix[Double], n: Int,
                               piOpt: Option[DenseVector[Double]] = None): DenseMatrix[Double] = {
    val pi = piOpt.getOrElse(LinAlg.stationaryDistribution(t))
    DenseMatrix.tabulate(t.rows, t.rows)((i, j) => n * pi(i) * t(i, j))
  }

  /** Hitting probability of `target` from every state
    * (dense/_hitting_probability.py:10): minimal non-negative solution of
    * h|A = 1, h_i = sum_j p_ij h_j elsewhere; absorbing non-target states
    * get 0. */
  def hittingProbability(t: DenseMatrix[Double], target: Set[Int]): DenseVector[Double] = {
    val n = t.rows
    // states that can never reach the target (single absorbing states like
    // the reference's diagonal test, but generalized to closed classes via
    // reverse reachability — a closed 2+-state trap would otherwise make
    // the linear system exactly singular)
    val canReach = {
      val reached = scala.collection.mutable.Set.empty[Int] ++ target
      val queue = scala.collection.mutable.Queue.empty[Int] ++ target
      while (queue.nonEmpty) {
        val j = queue.dequeue()
        for (i <- 0 until n if !reached.contains(i) && t(i, j) > 0) {
          reached += i
          queue.enqueue(i)
        }
      }
      reached.toSet
    }
    val stable = (0 until n).filter(i => !target.contains(i) && !canReach.contains(i)).toSet
    val origin = (0 until n).filterNot(i => target.contains(i) || stable.contains(i)).toArray
    val k = origin.length
    val a = DenseMatrix.tabulate(k, k)((i, j) =>
      t(origin(i), origin(j)) - (if (i == j) 1.0 else 0.0))
    val b = DenseVector.tabulate(k)(i => -target.toSeq.map(s => t(origin(i), s)).sum)
    val x = if (k > 0) a \ b else DenseVector.zeros[Double](0)
    val out = DenseVector.ones[Double](n)
    origin.zipWithIndex.foreach { case (s, i) => out(s) = x(i) }
    stable.foreach(s => out(s) = 0.0)
    target.foreach(s => out(s) = 1.0)
    out
  }

  /** Pseudo-generator rate matrix K = (T - I) / tau (first-order
    * approximation; estimation/dense/ratematrix.py pseudo method). */
  def pseudoGenerator(t: DenseMatrix[Double], tau: Double): DenseMatrix[Double] =
    (t - DenseMatrix.eye[Double](t.rows)) / tau

  /** Matrix-logarithm rate matrix for reversible T via RDL:
    * K = R diag(log lambda / tau) L, with negative off-diagonal rates
    * clamped to zero and the diagonal refilled so rows sum to 0
    * (ratematrix.py truncated-logarithm flavor). */
  def logGenerator(t: DenseMatrix[Double], tau: Double): DenseMatrix[Double] = {
    val (r, vals, l) = rdlReversible(t)
    val n = t.rows
    val logD = DenseVector.tabulate(vals.length)(i =>
      math.log(math.max(vals(i), 1e-12)) / tau)
    val k = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n; j <- 0 until n) {
      var acc = 0.0
      var m = 0
      while (m < vals.length) { acc += r(i, m) * logD(m) * l(m, j); m += 1 }
      k(i, j) = acc
    }
    // project to a valid generator
    for (i <- 0 until n) {
      for (j <- 0 until n if j != i) if (k(i, j) < 0) k(i, j) = 0.0
      k(i, i) = -(0 until n).filter(_ != i).map(j => k(i, j)).sum
    }
    k
  }

  /** Reversible MLE with FIXED stationary distribution
    * (mle_trev.h:102 `mle_trev_given_pi_dense`): Lagrange-multiplier fixed
    * point lam_j = sum_i (c_ij + c_ji) / (mu_j lam_i / (mu_i lam_j) + 1). */
  def reversibleMleFixedPi(counts: DenseMatrix[Double], mu: DenseVector[Double],
                           maxErr: Double = 1e-12, maxIter: Int = 1000000): DenseMatrix[Double] = {
    val n = counts.rows
    require((0 until n).forall(mu(_) > 0), "every element of pi must be positive")
    var lam = DenseVector.tabulate(n)(i =>
      (0 until n).map(j => 0.5 * (counts(i, j) + counts(j, i))).sum)
    require((0 until n).forall(lam(_) > 0), "some row+column of C has zero counts")
    var iter = 0
    var dsq = Double.MaxValue
    while (dsq > maxErr * maxErr && iter < maxIter) {
      val lamNew = DenseVector.tabulate(n) { j =>
        var s = 0.0
        var i = 0
        while (i < n) {
          val cij = counts(i, j) + counts(j, i)
          if (cij != 0) s += cij / ((mu(j) * lam(i)) / (mu(i) * lam(j)) + 1.0)
          i += 1
        }
        s
      }
      dsq = bsum((lamNew - lam) *:* (lamNew - lam))
      lam = lamNew
      iter += 1
    }
    val t = DenseMatrix.zeros[Double](n, n)
    for (i <- 0 until n) {
      var norm = 0.0
      for (j <- 0 until n if i != j) {
        val cij = counts(i, j) + counts(j, i)
        if (cij > 0) {
          t(i, j) = cij / (lam(i) + lam(j) * mu(i) / mu(j))
          norm += t(i, j)
        }
      }
      t(i, i) = if (norm > 1.0) 0.0 else 1.0 - norm
    }
    t
  }

  /** Distributed sample-by-state (reference markov/sample/__init__.py:74
    * `indices_by_state` / :177 `sample_indexes_by_state`): draw up to
    * `nSamples` (traj_id, t) frame indices per state, seeded. The draw is a
    * per-state window over a hash order — fully distributed, no index lists
    * ever materialize on the driver. */
  def sampleByState(dtraj: DataFrame, nSamples: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col("state"))
      .orderBy(xxhash64(col("traj_id"), col("t"), lit(seed)))
    dtraj.where(col("state") >= 0)
      .withColumn("sample_idx", row_number().over(w))
      .where(col("sample_idx") <= nSamples)
      .select(col("state"), col("sample_idx"), col("traj_id"), col("t"))
  }

  /** Sample frames according to per-distribution state probabilities
    * (markov/sample/__init__.py:124 `indices_by_distribution`, e.g. PCCA
    * metastable distributions): for each distribution, `nSample` states
    * are drawn on the driver (seeded multinomial — the distributions are
    * model-sized), then each draw resolves to an occurrence of that state
    * through the same distributed hash-ranked frame index sampleByState
    * uses (draw k of a state takes hash-rank (k mod available), i.e.
    * with-replacement across draws, bounded per-state output). Returns
    * (dist_idx, sample_idx, state, traj_id, t). */
  def sampleByDistribution(dtraj: DataFrame, distributions: Seq[Array[Double]],
                           nSample: Int, seed: Long = 42L): DataFrame = {
    val spark = dtraj.sparkSession
    import spark.implicits._
    val rng = new java.util.SplittableRandom(seed)
    // driver multinomial draws: (dist_idx, sample_idx, state, rank_within_state)
    val draws = distributions.zipWithIndex.flatMap { case (dist, d) =>
      val cum = dist.scanLeft(0.0)(_ + _).tail
      val seen = scala.collection.mutable.Map.empty[Int, Int]
      (0 until nSample).map { k =>
        val u = rng.nextDouble() * cum.last
        val s = cum.indexWhere(u <= _) max 0
        val r = seen.getOrElse(s, 0)
        seen(s) = r + 1
        (d, k, s, r)
      }
    }
    val drawsDf = broadcast(draws.toDF("dist_idx", "sample_idx", "state", "rank"))
    // occurrences hash-ranked per state; per-state need is bounded by the
    // max rank requested, so the window output stays small
    val maxRank = draws.groupBy(_._3).map { case (s, g) => s -> g.map(_._4).max }
    val maxRankDf = broadcast(maxRank.toSeq.toDF("state", "max_rank"))
    val w = Window.partitionBy(col("state"))
      .orderBy(xxhash64(col("traj_id"), col("t"), lit(seed)))
    // rank-limit the window on a LITERAL bound first: the per-state bound
    // is a broadcast COLUMN, which InferWindowGroupLimit cannot use, so
    // without the literal the window would sort every occurrence of a
    // state in one task (a common state at scale = a mega-partition).
    // With it, each map partition pre-keeps only the global-max top
    // ranks per state before the exchange; the column filter then trims
    // to the per-state need as before.
    val gMax = maxRank.values.foldLeft(0)(math.max)
    val ranked = dtraj.where(col("state") >= 0)
      .join(maxRankDf, "state")
      .withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") <= lit(gMax + 1))
      .withColumn("occ", col("graft_rn") - 1)
      .where(col("occ") <= col("max_rank"))
      .select(col("state"), col("occ"), col("traj_id"), col("t"))
    // per-state occurrence counts for the mod-available resolution
    val counts = ranked.groupBy("state").agg(max(col("occ")).as("n_occ"))
    drawsDf
      .join(broadcast(counts), "state")
      .withColumn("occ", col("rank") % (col("n_occ") + 1))
      .join(ranked, Seq("state", "occ"))
      .select(col("dist_idx"), col("sample_idx"), col("state"), col("traj_id"), col("t"))
  }
}
