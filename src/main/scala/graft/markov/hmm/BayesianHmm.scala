package graft.markov.hmm

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.apache.spark.sql.{DataFrame, Dataset}
import graft.markov.{RandomVariates, TmatrixSampler}

/** Bayesian HMM via Gibbs sampling (reference markov/hmm/_bayesian_hmm.py:
  * 153-643 `BayesianHMM`): alternate (1) forward-filter backward-sample of
  * hidden paths given the model, (2) transition-matrix posterior draw from
  * hidden transition counts, (3) emission-row Dirichlet draws from
  * hidden-observation counts.
  *
  * Distributed shape: step (1) — the data-sized work — runs as one Spark
  * pass per sweep: every trajectory samples its own hidden path locally
  * (seeded per (sweep, traj)) and emits O(m^2 + m*nObs) count statistics,
  * reduced tree-wise; steps (2)-(3) are driver-side draws on tiny
  * matrices. Hidden paths never leave the executors. */
object BayesianHmm {

  case class CountStats(trans: Array[Double], emit: Array[Double], init: Array[Double]) {
    def merge(o: CountStats): CountStats = {
      def add(a: Array[Double], b: Array[Double]) = {
        val r = a.clone; var i = 0
        while (i < r.length) { r(i) += b(i); i += 1 }
        r
      }
      CountStats(add(trans, o.trans), add(emit, o.emit), add(init, o.init))
    }
  }

  /** Forward-filter backward-sample for one observation sequence; returns
    * per-trajectory transition/emission/initial counts of the SAMPLED path
    * (_bayesian_hmm.py SampleHS step). */
  private[hmm] def ffbsCounts(obs: Array[Int], a: Array[Double], b: Array[Double],
                              pi: Array[Double], m: Int, nObs: Int,
                              rng: java.util.SplittableRandom): CountStats = {
    val tLen = obs.length
    val alpha = Array.ofDim[Double](tLen, m)
    // scaled forward pass
    var s0 = 0.0
    var i = 0
    while (i < m) { alpha(0)(i) = pi(i) * b(i * nObs + obs(0)); s0 += alpha(0)(i); i += 1 }
    if (s0 <= 0) s0 = 1e-300
    i = 0; while (i < m) { alpha(0)(i) /= s0; i += 1 }
    var t = 1
    while (t < tLen) {
      var st = 0.0
      var j = 0
      while (j < m) {
        var acc = 0.0
        var k = 0
        while (k < m) { acc += alpha(t - 1)(k) * a(k * m + j); k += 1 }
        val v = acc * b(j * nObs + obs(t))
        alpha(t)(j) = v; st += v
        j += 1
      }
      if (st <= 0) st = 1e-300
      j = 0; while (j < m) { alpha(t)(j) /= st; j += 1 }
      t += 1
    }
    // backward sampling
    def drawFrom(w: Array[Double]): Int = {
      val z = w.sum
      if (z <= 0) return rng.nextInt(m)
      var u = rng.nextDouble() * z
      var k = 0
      while (k < w.length - 1) {
        u -= w(k)
        if (u < 0) return k
        k += 1
      }
      w.length - 1
    }
    val path = new Array[Int](tLen)
    path(tLen - 1) = drawFrom(alpha(tLen - 1))
    t = tLen - 2
    while (t >= 0) {
      val w = Array.tabulate(m)(k => alpha(t)(k) * a(k * m + path(t + 1)))
      path(t) = drawFrom(w)
      t -= 1
    }
    // counts
    val trans = new Array[Double](m * m)
    val emit = new Array[Double](m * nObs)
    val init = new Array[Double](m)
    init(path(0)) = 1.0
    t = 0
    while (t < tLen) {
      emit(path(t) * nObs + obs(t)) += 1.0
      if (t < tLen - 1) trans(path(t) * m + path(t + 1)) += 1.0
      t += 1
    }
    CountStats(trans, emit, init)
  }

  case class BayesianHmmPosterior(prior: Hmm.HmmModel, samples: Seq[Hmm.HmmModel]) {
    def gather(f: Hmm.HmmModel => Double, conf: Double = 0.95): (Double, Double, Double, Double) = {
      val vals = samples.map(f)
      val mean = vals.sum / vals.size
      val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / math.max(1, vals.size - 1))
      val (lo, hi) = graft.util.Stats.confidenceInterval(vals, conf)
      (mean, std, lo, hi)
    }

    /** Generic statistics facade over an arbitrary (vector-valued) model
      * quantity (util/stats.py:197-290 `QuantityStatistics.gather`). */
    def gatherStats(f: Hmm.HmmModel => Array[Double], quantity: String = "",
                    conf: Double = 0.95): graft.util.QuantityStatistics =
      graft.util.QuantityStatistics.gather(samples, f, quantity, conf)
  }

  /** Size crossover for the Gibbs sweep transport (the GlobalIndex Auto /
    * duplicateClusters discipline): a Gibbs chain is inherently
    * sequential — each sweep is one cluster-wide job whose useful work is
    * tiny at driver SFs, so below this many TOTAL observations the
    * trajectories are collected ONCE (id-sorted, model-sized by the
    * bound) and every sweep runs driver-local with the SAME per-(sweep,
    * traj) seeded RNG: counts are integer-valued, so the result is
    * IDENTICAL to the distributed reduce, minus ~nSweeps × stride job
    * launches. Above the bound, sweeps stay one-job-per-sweep with only
    * O(m² + m·nObs) statistics reduced — the 100 TB shape. */
  val LocalSweepThreshold: Long = 2000000L

  /** Gibbs sampler seeded from a maximum-likelihood model (the reference
    * initializes from an :class:`MaximumLikelihoodHMM` fit). `stride`
    * sweeps separate retained samples to decorrelate the chain. */
  /** The discrete per-trajectory grouping `sample` consumes — exposed so
    * a caller running BOTH transports over the same input (the q265
    * parity gate) can build + cache it once and pass it via
    * `groupedOpt` instead of paying the groupByKey per run. */
  def groupDiscrete(dtraj: DataFrame): Dataset[(Long, Array[Int])] = {
    val spark = dtraj.sparkSession
    import spark.implicits._
    dtraj.select("traj_id", "t", "state").as[(Long, Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (id, it) => (id, it.toArray.sortBy(_._2).map(_._3)) }
  }

  def sample(dtraj: DataFrame, mlModel: Hmm.HmmModel, nObs: Int, nSamples: Int = 50,
             stride: Int = 2, reversible: Boolean = true, seed: Long = 42L,
             priorPseudocount: Double = 1e-2,
             localThreshold: Long = LocalSweepThreshold,
             groupedOpt: Option[Dataset[(Long, Array[Int])]] = None): BayesianHmmPosterior = {
    val spark = dtraj.sparkSession
    import spark.implicits._
    val m = mlModel.transition.rows
    // ONE evaluation of the input lineage: the cache fills while the
    // observation count (== dtraj row count) reduces from it; the local
    // branch then collects FROM the cache and releases it (r13 review:
    // the dtraj.count()-then-cache shape scanned the input twice in the
    // at-scale branch). A caller-supplied grouping (groupedOpt) is
    // caller-cached and caller-owned — never unpersisted here.
    val ownGrouping = groupedOpt.isEmpty
    val trajs = groupedOpt.getOrElse(groupDiscrete(dtraj).cache())
    val nTotal = trajs.map(_._2.length.toLong).reduce(_ + _)
    val localArr: Option[Array[(Long, Array[Int])]] =
      if (nTotal <= localThreshold) {
        val arr = trajs.collect().sortBy(_._1)
        if (ownGrouping) trajs.unpersist()
        Some(arr)
      } else None

    var a = mlModel.transition.copy
    var b = mlModel.emission.copy
    var piV = mlModel.initial.copy
    val rng = new java.util.SplittableRandom(seed)
    val out = scala.collection.mutable.ArrayBuffer.empty[Hmm.HmmModel]
    var sweep = 0
    while (out.length < nSamples) {
      val aF = graft.linalg.LinAlg.toFlat(a)
      val bF = graft.linalg.LinAlg.toFlat(b)
      val piF = piV.toArray
      val sweepSeed = rng.nextLong()
      // ONE per-trajectory body for both transports — a function VALUE
      // capturing only the flat model arrays + sweep seed (Scala 2.12+
      // lambdas reach module methods through the static MODULE$, so
      // nothing non-serializable is captured; this is exactly how the
      // distributed branch already called ffbsCounts). Keeping a single
      // copy keeps the seed derivation bit-identical by construction.
      val body = (t: (Long, Array[Int])) => {
        val trng = new java.util.SplittableRandom(sweepSeed ^ (t._1 * 0x9E3779B97F4A7C15L))
        ffbsCounts(t._2, aF, bF, piF, m, nObs, trng)
      }
      val stats = localArr match {
        // parallel per-trajectory FFBS, SEQUENTIAL id-ordered merge —
        // bit-identical to the old iterator fold (per-trajectory RNG is
        // keyed by traj id, merge order unchanged); only the expensive
        // FFBS passes spread across the app's cores
        case Some(arr) =>
          graft.util.Par.mapOrdered(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))(body)
            .reduce((x, y) => x.merge(y))
        case None =>
          // tag the per-sweep reduce job (UI legibility + the bayes100
          // scheduler-level transport audit keys on this description);
          // JobTag restores the caller's own description afterwards
          graft.util.JobTag.withDescription(spark.sparkContext,
              s"BayesianHmm FFBS sweep $sweep") {
            trajs.map(body).reduce((x, y) => x.merge(y))
          }
      }
      // (2) transition posterior
      val transCounts = graft.linalg.LinAlg.fromFlat(stats.trans, m) +:+ priorPseudocount
      a = if (reversible)
        TmatrixSampler.sampleReversible(transCounts, 1, rng.nextLong(), nSteps = 1, burnIn = 0).head
      else TmatrixSampler.sampleNonReversible(transCounts, rng)
      // (3) emission posterior: Dirichlet per hidden state
      for (k <- 0 until m) {
        val alpha = Array.tabulate(nObs)(o => stats.emit(k * nObs + o) + priorPseudocount)
        val row = RandomVariates.dirichlet(rng, alpha)
        (0 until nObs).foreach(o => b(k, o) = row(o))
      }
      // initial distribution posterior
      val piDraw = RandomVariates.dirichlet(rng,
        Array.tabulate(m)(k => stats.init(k) + priorPseudocount))
      piV = DenseVector(piDraw)
      sweep += 1
      if (sweep % stride == 0)
        out += Hmm.HmmModel(a.copy, b.copy, piV.copy, Double.NaN, sweep)
    }
    if (localArr.isEmpty && ownGrouping) trajs.unpersist()
    BayesianHmmPosterior(mlModel, out.toSeq)
  }

  /** Convenience: ML fit then posterior sampling. `localThreshold = 0`
    * forces the distributed per-sweep reduce (the 100 TB transport) at
    * any size — oracle-gated by q265 alongside the default crossover. */
  def fit(dtraj: DataFrame, nHidden: Int, nObs: Int, nSamples: Int = 50,
          lagtime: Int = 1, reversible: Boolean = true, seed: Long = 42L,
          maxIterMl: Int = 50,
          localThreshold: Long = LocalSweepThreshold): BayesianHmmPosterior = {
    val ml = Hmm.fit(dtraj, nHidden, nObs, lagtime, maxIter = maxIterMl,
      reversible = reversible)
    sample(dtraj, ml, nObs, nSamples, reversible = reversible, seed = seed,
      localThreshold = localThreshold)
  }

  // --- Gaussian output models -----------------------------------------------

  /** Per-sweep sufficient statistics of a sampled hidden path over
    * CONTINUOUS observations: hidden transition/initial counts plus per-
    * state (n, Σx, Σx²) — everything the (μ, σ) posterior draw needs, so
    * observations never leave the executors. */
  case class GaussCountStats(trans: Array[Double], init: Array[Double],
                             n: Array[Double], sx: Array[Double], sxx: Array[Double]) {
    def merge(o: GaussCountStats): GaussCountStats = {
      def add(a: Array[Double], b: Array[Double]) = {
        val r = a.clone; var i = 0
        while (i < r.length) { r(i) += b(i); i += 1 }
        r
      }
      GaussCountStats(add(trans, o.trans), add(init, o.init),
        add(n, o.n), add(sx, o.sx), add(sxx, o.sxx))
    }
  }

  @inline private def gaussPdf(x: Double, mu: Double, sigma: Double): Double = {
    val s = math.max(sigma, 1e-8)
    val z = (x - mu) / s
    math.exp(-0.5 * z * z) / (s * math.sqrt(2.0 * math.Pi))
  }

  /** Forward-filter backward-sample over Gaussian emissions; emits the
    * sampled path's sufficient statistics. */
  private[hmm] def ffbsGaussCounts(obs: Array[Double], a: Array[Double],
                                   means: Array[Double], sigmas: Array[Double],
                                   pi: Array[Double], m: Int,
                                   rng: java.util.SplittableRandom): GaussCountStats = {
    val tLen = obs.length
    val alpha = Array.ofDim[Double](tLen, m)
    var s0 = 0.0
    var i = 0
    while (i < m) { alpha(0)(i) = pi(i) * gaussPdf(obs(0), means(i), sigmas(i)); s0 += alpha(0)(i); i += 1 }
    if (s0 <= 0) s0 = 1e-300
    i = 0; while (i < m) { alpha(0)(i) /= s0; i += 1 }
    var t = 1
    while (t < tLen) {
      var st = 0.0
      var j = 0
      while (j < m) {
        var acc = 0.0
        var k = 0
        while (k < m) { acc += alpha(t - 1)(k) * a(k * m + j); k += 1 }
        val v = acc * gaussPdf(obs(t), means(j), sigmas(j))
        alpha(t)(j) = v; st += v
        j += 1
      }
      if (st <= 0) st = 1e-300
      j = 0; while (j < m) { alpha(t)(j) /= st; j += 1 }
      t += 1
    }
    def drawFrom(w: Array[Double]): Int = {
      val z = w.sum
      if (z <= 0) return rng.nextInt(m)
      var u = rng.nextDouble() * z
      var k = 0
      while (k < w.length - 1) {
        u -= w(k)
        if (u < 0) return k
        k += 1
      }
      w.length - 1
    }
    val path = new Array[Int](tLen)
    path(tLen - 1) = drawFrom(alpha(tLen - 1))
    t = tLen - 2
    while (t >= 0) {
      val w = Array.tabulate(m)(k => alpha(t)(k) * a(k * m + path(t + 1)))
      path(t) = drawFrom(w)
      t -= 1
    }
    val trans = new Array[Double](m * m)
    val init = new Array[Double](m)
    val n = new Array[Double](m)
    val sx = new Array[Double](m)
    val sxx = new Array[Double](m)
    init(path(0)) = 1.0
    t = 0
    while (t < tLen) {
      val k = path(t); val x = obs(t)
      n(k) += 1.0; sx(k) += x; sxx(k) += x * x
      if (t < tLen - 1) trans(k * m + path(t + 1)) += 1.0
      t += 1
    }
    GaussCountStats(trans, init, n, sx, sxx)
  }

  case class BayesianGaussianHmmPosterior(prior: GaussianHmm.GaussianHmmModel,
                                          samples: Seq[GaussianHmm.GaussianHmmModel]) {
    def gatherStats(f: GaussianHmm.GaussianHmmModel => Array[Double],
                    quantity: String = "", conf: Double = 0.95): graft.util.QuantityStatistics =
      graft.util.QuantityStatistics.gather(samples, f, quantity, conf)
  }

  /** Gibbs sampler over GAUSSIAN output models (_bayesian_hmm.py `_update`
    * with GaussianOutputModel.sample, _output_model.py:435): per sweep,
    * (1) FFBS hidden paths (one Spark pass, sufficient stats reduced
    * tree-wise), (2) emission posterior per state —
    * μ_k ~ N(mean_k, σ_k/√n_k), then σ_k = √(mean((x−μ_k)²)) /
    * √(χ²(n_k−1)/n_k) under the Jeffreys prior P(μ,σ²) ∝ 1/σ —
    * (3) transition + initial posterior draws as in the discrete case. */
  /** Gaussian twin of [[groupDiscrete]] (the q265 shared-grouping hook). */
  def groupGaussian(traj: DataFrame,
                    valueCol: String = "value"): Dataset[(Long, Array[Double])] = {
    val spark = traj.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    traj.select(col("traj_id").cast("long"), col("t").cast("long"),
        col(valueCol).cast("double")).as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (id, it) => (id, it.toArray.sortBy(_._2).map(_._3)) }
  }

  def sampleGaussian(traj: DataFrame, mlModel: GaussianHmm.GaussianHmmModel,
                     nSamples: Int = 50, stride: Int = 2, reversible: Boolean = true,
                     seed: Long = 42L, valueCol: String = "value",
                     priorPseudocount: Double = 1e-2,
                     localThreshold: Long = LocalSweepThreshold,
                     groupedOpt: Option[Dataset[(Long, Array[Double])]] = None): BayesianGaussianHmmPosterior = {
    val spark = traj.sparkSession
    import spark.implicits._
    val m = mlModel.transition.rows
    // same crossover as `sample`: per-trajectory statistics are computed
    // by identical seeded code either way; the id-sorted local merge and
    // the distributed reduce differ only in float sum ORDER of (Σx, Σx²)
    // partials — and the distributed order is itself nondeterministic, so
    // callers already cannot rely on it
    val ownGrouping = groupedOpt.isEmpty
    val trajs = groupedOpt.getOrElse(groupGaussian(traj, valueCol).cache())
    val nTotal = trajs.map(_._2.length.toLong).reduce(_ + _)
    val localArr: Option[Array[(Long, Array[Double])]] =
      if (nTotal <= localThreshold) {
        val arr = trajs.collect().sortBy(_._1)
        if (ownGrouping) trajs.unpersist()
        Some(arr)
      } else None

    var a = mlModel.transition.copy
    var means = mlModel.means.clone()
    var sigmas = mlModel.sigmas.clone()
    var piV = mlModel.initial.copy
    val rng = new java.util.SplittableRandom(seed)
    val out = scala.collection.mutable.ArrayBuffer.empty[GaussianHmm.GaussianHmmModel]
    var sweep = 0
    while (out.length < nSamples) {
      val aF = graft.linalg.LinAlg.toFlat(a)
      val meansF = means.clone(); val sigmasF = sigmas.clone()
      val piF = piV.toArray
      val sweepSeed = rng.nextLong()
      // one shared per-trajectory body (see `sample`)
      val body = (t: (Long, Array[Double])) => {
        val trng = new java.util.SplittableRandom(sweepSeed ^ (t._1 * 0x9E3779B97F4A7C15L))
        ffbsGaussCounts(t._2, aF, meansF, sigmasF, piF, m, trng)
      }
      val stats = localArr match {
        // parallel per-trajectory FFBS, SEQUENTIAL id-ordered merge —
        // bit-identical to the old iterator fold (see `sample`)
        case Some(arr) =>
          graft.util.Par.mapOrdered(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))(body)
            .reduce((x, y) => x.merge(y))
        case None =>
          graft.util.JobTag.withDescription(spark.sparkContext,
              s"BayesianHmm Gaussian FFBS sweep $sweep") {
            trajs.map(body).reduce((x, y) => x.merge(y))
          }
      }
      // (2) Gaussian emission posterior per state (reference order: μ with
      // the CURRENT σ, then σ with the NEW μ; skip empty states)
      for (k <- 0 until m) {
        val nk = stats.n(k)
        if (nk > 0) {
          val xbar = stats.sx(k) / nk
          means(k) = rng.nextGaussian() * sigmas(k) / math.sqrt(nk) + xbar
        }
        if (nk > 1) {
          val chi2 = 2.0 * RandomVariates.gamma(rng, (nk - 1.0) / 2.0)
          // mean((x-μ)²) from the sufficient statistics
          val sigmahat2 = stats.sxx(k) / nk - 2.0 * means(k) * stats.sx(k) / nk +
            means(k) * means(k)
          sigmas(k) = math.sqrt(math.max(sigmahat2, 1e-12)) /
            math.sqrt(math.max(chi2, 1e-12) / nk)
        }
      }
      // (3) transition + initial posterior
      val transCounts = graft.linalg.LinAlg.fromFlat(stats.trans, m) +:+ priorPseudocount
      a = if (reversible)
        TmatrixSampler.sampleReversible(transCounts, 1, rng.nextLong(), nSteps = 1, burnIn = 0).head
      else TmatrixSampler.sampleNonReversible(transCounts, rng)
      val piDraw = RandomVariates.dirichlet(rng,
        Array.tabulate(m)(k => stats.init(k) + priorPseudocount))
      piV = DenseVector(piDraw)
      sweep += 1
      if (sweep % stride == 0)
        out += GaussianHmm.GaussianHmmModel(a.copy, means.clone(), sigmas.clone(),
          piV.copy, Double.NaN, sweep)
    }
    if (localArr.isEmpty && ownGrouping) trajs.unpersist()
    BayesianGaussianHmmPosterior(mlModel, out.toSeq)
  }

  /** Convenience: Gaussian ML (Baum-Welch) fit then posterior sampling.
    * `localThreshold = 0` forces the distributed per-sweep reduce. */
  def fitGaussian(traj: DataFrame, nHidden: Int, nSamples: Int = 50,
                  reversible: Boolean = true, seed: Long = 42L,
                  valueCol: String = "value", maxIterMl: Int = 50,
                  localThreshold: Long = LocalSweepThreshold): BayesianGaussianHmmPosterior = {
    val ml = GaussianHmm.fit(traj, nHidden, valueCol, maxIter = maxIterMl,
      localThreshold = localThreshold)
    sampleGaussian(traj, ml, nSamples, reversible = reversible, seed = seed,
      valueCol = valueCol, localThreshold = localThreshold)
  }
}
