package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Trajectories.{TrajCol, TimeCol}

/** TRAM — transition-based reweighting analysis method for multi-ensemble
  * Markov models (reference markov/msm/tram/_tram.py +
  * src/include/deeptime/markov/msm/tram/tram.h; Wu et al. PNAS 2016).
  *
  * Estimates per-thermodynamic-state MSMs and free energies from biased
  * simulations run in K ensembles.
  *
  * Distributed shape: the data-sized inputs — per-ensemble transition
  * counts, state counts, and the per-sample bias-energy table — are
  * assembled with Spark jobs (`countsFromFrames`); the TRAM fixed-point
  * runs on the driver over a deterministically size-capped sample of the
  * bias table (same landmark contract as the kernel methods: the
  * self-consistent sweep is sample-order-free, so a capped uniform sample
  * estimates the same mu(x) sums; raise `maxSamples` to spend more memory
  * for accuracy). All K x n x n state is model-sized. */
object Tram {

  private val inf = Double.PositiveInfinity
  private val prior = 0.0
  private val logPrior = -inf // matches reference tram::detail with prior 0

  private def logsumexpPair(a: Double, b: Double): Double = {
    if (a == -inf) return b
    if (b == -inf) return a
    val m = math.max(a, b)
    m + math.log(math.exp(a - m) + math.exp(b - m))
  }

  private def logsumexp(xs: Array[Double], n: Int): Double = {
    var m = -inf
    var i = 0
    while (i < n) { if (xs(i) > m) m = xs(i); i += 1 }
    if (m == -inf) return -inf
    var s = 0.0
    i = 0
    while (i < n) { s += math.exp(xs(i) - m); i += 1 }
    m + math.log(s)
  }

  /** Per-ensemble inputs: counts (K x n x n flattened), state counts
    * (K x n), and per-sample (markovState, biasEnergies[K]). */
  case class TramInput(nTherm: Int, nMarkov: Int,
                       transitionCounts: Array[Array[Double]],  // K of n*n
                       stateCounts: Array[Array[Double]],       // K of n
                       samples: Array[(Int, Array[Double])])    // (i, b_k(x))

  case class TramModel(
      biasedConfEnergies: DenseMatrix[Double],   // f^k_i (K x n)
      markovStateEnergies: DenseVector[Double],  // f_i
      thermStateEnergies: DenseVector[Double],   // f^k
      transitionMatrices: Array[DenseMatrix[Double]],
      iterations: Int, finalError: Double,
      /** log R^k_i — the modified state counts the sample-weight /
        * observable / PMF / likelihood methods need (tram.h:61). */
      modifiedStateCountsLog: DenseMatrix[Double] = null) {
    /** Unbiased stationary estimate pi_i proportional to exp(-f_i). */
    def stationaryDistribution: DenseVector[Double] = {
      val w = markovStateEnergies.toArray.map(f => math.exp(-f))
      DenseVector(w.map(_ / w.sum))
    }
    def msm(k: Int, tau: Int = 1): MarkovStateModel =
      MarkovStateModel(transitionMatrices(k), tau)
  }

  /** Assemble TramInput from per-ensemble dtraj frames carrying a
    * `bias` ARRAY<DOUBLE> column of length K (bias energy of the sample
    * evaluated in every ensemble). One Spark pass per ensemble for counts;
    * one capped collect for the bias table. */
  def inputFromFrames(framesPerTherm: Seq[DataFrame], tau: Int, nMarkov: Int,
                      maxSamples: Int = 200000, seed: Long = 42L): TramInput = {
    val k = framesPerTherm.length
    val (transitionCounts, stateCounts) =
      countsFromFrames(framesPerTherm, tau, nMarkov)
    val all = framesPerTherm.map(_.select(col("state"), col("bias"))).reduce(_ unionAll _)
    val total = all.count()
    val frac = math.min(1.0, maxSamples.toDouble / math.max(1L, total))
    val sampled = (if (frac < 1.0) all.sample(withReplacement = false, frac, seed) else all)
      .limit(maxSamples).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    TramInput(k, nMarkov, transitionCounts, stateCounts, sampled)
  }

  /** Per-ensemble transition + state counts (one Spark pass each —
    * model-sized results). */
  private def countsFromFrames(framesPerTherm: Seq[DataFrame], tau: Int,
                               nMarkov: Int): (Array[Array[Double]], Array[Array[Double]]) = {
    val transitionCounts = framesPerTherm.map { df =>
      val c = TransitionCounting.toDense(
        TransitionCounting.slidingCounts(df, tau), nMarkov)
      graft.linalg.LinAlg.toFlat(c)
    }.toArray
    val stateCounts = framesPerTherm.map { df =>
      val hist = df.where(col("state") >= 0).groupBy("state").count().collect()
      val arr = new Array[Double](nMarkov)
      hist.foreach(r => arr(r.getInt(0)) = r.getLong(1).toDouble)
      arr
    }.toArray
    (transitionCounts, stateCounts)
  }

  /** Fully-distributed TRAM fit: the fixed point iterates over ALL
    * samples — the reference's semantics (tram.h:671 sums every sample;
    * the capped [[fit]] path is the landmark approximation) — with the
    * bias table held as a persisted Spark RDD and each E-step one
    * treeAggregate whose partials are K x n logsumexp cells. Nothing
    * sample-sized ever reaches the driver; at 100 TB of bias samples the
    * per-iteration exchange is (partitions x K x n) doubles.
    *
    * Parallelism is sized by sample count (the duplicateClusters
    * discipline): a fixture-sized table at 32 partitions would pay ~30
    * scheduling round-trips per sweep for nothing. */
  def fitDistributed(framesPerTherm: Seq[DataFrame], tau: Int, nMarkov: Int,
                     maxIter: Int = 1000, maxErr: Double = 1e-8,
                     precomputedCounts: Option[(Array[Array[Double]], Array[Array[Double]])] = None): TramModel = {
    val k = framesPerTherm.length
    // callers that already assembled counts for the same frames (the
    // q263 parity gate runs inputFromFrames over the identical fixture)
    // pass them in rather than re-running the 2-jobs-per-frame assembly
    val (transitionCounts, stateCounts) = precomputedCounts.getOrElse(
      countsFromFrames(framesPerTherm, tau, nMarkov))
    val all = framesPerTherm.map(_.select(col("state"), col("bias")))
      .reduce(_ unionAll _)
    // typed-encoder extraction (r14): `df.rdd` + Row getters deserialize
    // every sample through GenericRow + boxed getSeq — the codegen'd
    // tuple encoder builds (Int, Array[Double]) directly on the one pass
    // that fills the persisted sweep cache
    val spark0 = all.sparkSession
    import spark0.implicits._
    val rdd0 = all.as[(Int, Array[Double])].rdd
    val parts = math.max(1, math.min(
      all.sparkSession.sparkContext.defaultParallelism,
      (rdd0.getNumPartitions / 4) + 1))
    val rdd = (if (rdd0.getNumPartitions > parts) rdd0.coalesce(parts) else rdd0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      fitCore(k, nMarkov, transitionCounts, stateCounts,
        new DistributedTramSamples(rdd, k, nMarkov), maxIter, maxErr, tau)
    } finally rdd.unpersist(blocking = false)
  }

  /** The two sample-dependent sums of the fixed point, abstracted so the
    * SAME iteration runs over a driver-collected sample array (the capped
    * landmark path) or a Spark-distributed bias table (ALL samples — the
    * reference's semantics, tram.h:671 iterates every sample). Everything
    * else in the sweep is K x n model-sized driver algebra. */
  trait TramSamples {
    /** f^k_i update (tram.h updateBiasedConfEnergies): for every sample x
      * in markov state i, divisor_x = logsumexp_k'(R^k'_i - b_k'(x)) over
      * ensembles with finite R; returns
      * newConf(k,i) = -logsumexp_x( -(divisor_x + b_k(x)) ). */
    def confEnergyUpdate(modStateCountsLog: DenseMatrix[Double]): DenseMatrix[Double]
    /** f_i update (tram.h updateMarkovStateEnergies):
      * f_i = -logsumexp_x in i( -divisor_x ). */
    def markovEnergyUpdate(modStateCountsLog: DenseMatrix[Double]): DenseVector[Double]
  }

  /** Driver-array sample sums — iteration order identical to the r11
    * in-line loops (grouped by state, insertion order), so capped-path
    * results are bit-for-bit unchanged. */
  final class LocalTramSamples(samples: Array[(Int, Array[Double])],
                               kT: Int, n: Int) extends TramSamples {
    private val samplesByState =
      Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    samples.foreach { case (i, b) => if (i >= 0 && i < n) samplesByState(i) += b }

    // Both updates are parallelized OVER STATES (Par.mapOrdered): each
    // state i reads its own sample bucket in insertion order and writes
    // only the (·, i) cells, so the per-cell accumulation sequence — and
    // therefore every float bit — is identical to the sequential loop.
    // The sweeps dominate q60/q252/q263's driver time (a 100-sweep fit
    // over 200k samples is ~20M logsumexp chains on one core otherwise).
    def confEnergyUpdate(r: DenseMatrix[Double]): DenseMatrix[Double] = {
      val newConf = DenseMatrix.fill(kT, n)(inf)
      // per-state accumulation into THREAD-LOCAL cells (acc), written to
      // the shared matrix once per state: the 2 x 5 result is a single
      // cache line, and per-sample writes to it from 5 threads would
      // false-share (measured: the shared-write variant ran SLOWER than
      // the sequential loop it replaced)
      graft.util.Par.mapOrdered(0 until n) { i =>
        val scratch = new Array[Double](kT)
        val rCol = Array.tabulate(kT)(k => r(k, i))
        val acc = Array.fill(kT)(inf)
        for (b <- samplesByState(i)) {
          var o = 0
          var k = 0
          while (k < kT) {
            if (rCol(k) > -inf) { scratch(o) = rCol(k) - b(k); o += 1 }
            k += 1
          }
          val divisor = logsumexp(scratch, o)
          k = 0
          while (k < kT) {
            acc(k) = -logsumexpPair(-acc(k), -(divisor + b(k)))
            k += 1
          }
        }
        var k = 0
        while (k < kT) { newConf(k, i) = acc(k); k += 1 }
      }
      newConf
    }

    def markovEnergyUpdate(r: DenseMatrix[Double]): DenseVector[Double] = {
      val energies = DenseVector.fill(n)(inf)
      graft.util.Par.mapOrdered(0 until n) { i =>
        val scratch = new Array[Double](kT)
        val rCol = Array.tabulate(kT)(k => r(k, i))
        var acc = inf
        for (b <- samplesByState(i)) {
          var o = 0
          var k = 0
          while (k < kT) {
            if (rCol(k) > -inf) { scratch(o) = rCol(k) - b(k); o += 1 }
            k += 1
          }
          val divisor = logsumexp(scratch, o)
          acc = -logsumexpPair(-acc, -divisor)
        }
        energies(i) = acc
      }
      energies
    }
  }

  /** Distributed sample sums over an RDD of (markovState, biasEnergies):
    * per call ONE treeAggregate whose accumulator is K x n (resp. n)
    * logsumexp cells — partials are model-sized however many samples the
    * bias table holds, the SURVEY §2.7 mapping. logsumexpPair is
    * associative and commutative in exact arithmetic, so the tree
    * combine computes the same sums as the sequential driver loop up to
    * float re-association (~1e-15/term; TramDistributedSpec pins
    * agreement). Broadcasts are destroyed per call — the fixed point may
    * run hundreds of iterations. */
  final class DistributedTramSamples(
      rdd: org.apache.spark.rdd.RDD[(Int, Array[Double])],
      kT: Int, n: Int) extends TramSamples {

    private def aggregate(r: DenseMatrix[Double], markovOnly: Boolean): Array[Double] = {
      val rFlat = Array.tabulate(kT * n)(x => r(x / n, x % n))
      val bc = rdd.sparkContext.broadcast(rFlat)
      val width = if (markovOnly) n else kT * n
      val kT0 = kT
      val n0 = n
      val zero = Array.fill(width)(-inf)
      val res = rdd.treeAggregate(zero)(
        seqOp = { (acc, s) =>
          val i = s._1
          if (i >= 0 && i < n0) {
            val b = s._2
            val rf = bc.value
            val scratch = new Array[Double](kT0)
            var o = 0
            var k = 0
            while (k < kT0) {
              val rv = rf(k * n0 + i)
              if (rv > -inf) { scratch(o) = rv - b(k); o += 1 }
              k += 1
            }
            val divisor = logsumexp(scratch, o)
            if (markovOnly) acc(i) = logsumexpPair(acc(i), -divisor)
            else {
              k = 0
              while (k < kT0) {
                acc(k * n0 + i) = logsumexpPair(acc(k * n0 + i), -(divisor + b(k)))
                k += 1
              }
            }
          }
          acc
        },
        combOp = { (a, b2) =>
          var j = 0
          while (j < a.length) { a(j) = logsumexpPair(a(j), b2(j)); j += 1 }
          a
        })
      bc.destroy()
      res
    }

    def confEnergyUpdate(r: DenseMatrix[Double]): DenseMatrix[Double] = {
      val acc = aggregate(r, markovOnly = false)
      DenseMatrix.tabulate(kT, n)((k, i) => -acc(k * n + i))
    }

    def markovEnergyUpdate(r: DenseMatrix[Double]): DenseVector[Double] = {
      val acc = aggregate(r, markovOnly = true)
      DenseVector.tabulate(n)(i => -acc(i))
    }
  }

  /** Self-consistent TRAM iteration (tram.h:248 `estimate`) over the
    * capped driver-collected sample table. */
  def fit(input: TramInput, maxIter: Int = 1000, maxErr: Double = 1e-8,
          tau: Int = 1): TramModel =
    fitCore(input.nTherm, input.nMarkov, input.transitionCounts,
      input.stateCounts,
      new LocalTramSamples(input.samples, input.nTherm, input.nMarkov),
      maxIter, maxErr, tau)

  /** The fixed point itself, sample-backend-agnostic. */
  private def fitCore(nTherm: Int, nMarkov: Int,
                      transitionCounts: Array[Array[Double]],
                      stateCounts: Array[Array[Double]],
                      sampleSums: TramSamples,
                      maxIter: Int, maxErr: Double, tau: Int): TramModel = {
    val kT = nTherm
    val n = nMarkov
    def tc(k: Int, i: Int, j: Int) = transitionCounts(k)(i * n + j)
    def sc(k: Int, i: Int) = stateCounts(k)(i)

    // state: log v, f^k_i, log R^k_i, f^k
    val logV = DenseMatrix.tabulate(kT, n) { (k, i) =>
      val s = (0 until n).map(j => tc(k, i, j) + tc(k, j, i)).sum
      math.log(s / 2.0)
    }
    var biasedConf = DenseMatrix.zeros[Double](kT, n)
    val modStateCountsLog = DenseMatrix.fill(kT, n)(-inf)
    val thermEnergies = DenseVector.zeros[Double](kT)
    var statVectors = DenseMatrix.zeros[Double](kT, n)

    def updateLagrangianMult(): Unit = {
      val oldV = logV.copy
      val scratch = new Array[Double](n)
      for (k <- 0 until kT; i <- 0 until n) {
        if (sc(k, i) == 0) logV(k, i) = -inf
        else {
          var o = 0
          for (j <- 0 until n) {
            val ckij = tc(k, i, j)
            if (i == j) {
              scratch(o) = if (ckij == 0) logPrior else math.log(prior + ckij)
              o += 1
            } else {
              val ck = ckij + tc(k, j, i)
              if (ck != 0) {
                val divisor = logsumexpPair(
                  oldV(k, j) - biasedConf(k, i) - oldV(k, i) + biasedConf(k, j), 0.0)
                scratch(o) = math.log(ck) - divisor
                o += 1
              }
            }
          }
          logV(k, i) = logsumexp(scratch, o)
        }
      }
    }

    def updateStateCounts(): Unit = {
      for (k <- 0 until kT; i <- 0 until n) {
        if (sc(k, i) == 0) modStateCountsLog(k, i) = -inf
        else {
          val scratch = scala.collection.mutable.ArrayBuffer.empty[Double]
          var ci = 0.0
          for (j <- 0 until n) {
            val ckij = tc(k, i, j); val ckji = tc(k, j, i)
            ci += ckji
            if (i == j) {
              val cl = if (ckij == 0) logPrior else math.log(prior + ckij)
              scratch += cl + biasedConf(k, i)
            } else {
              val ck = ckij + ckji
              if (ck > 0) {
                val divisor = logsumexpPair(
                  logV(k, j) - biasedConf(k, i), logV(k, i) - biasedConf(k, j))
                scratch += math.log(ck) + logV(k, j) - divisor
              }
            }
          }
          val nc = sc(k, i) - ci
          val extra = if (nc > 0) math.log(nc) + biasedConf(k, i) else -inf
          modStateCountsLog(k, i) =
            logsumexpPair(logsumexp(scratch.toArray, scratch.length), extra)
        }
      }
    }

    def updateBiasedConfEnergies(): Unit = {
      biasedConf = sampleSums.confEnergyUpdate(modStateCountsLog)
    }

    def updateThermEnergies(): Unit = {
      val scratch = new Array[Double](n)
      for (k <- 0 until kT) {
        for (i <- 0 until n) scratch(i) = -biasedConf(k, i)
        thermEnergies(k) = -logsumexp(scratch, n)
      }
    }

    def shiftToZeroMin(): Unit = {
      val shift = breeze.linalg.min(biasedConf)
      if (shift.isFinite) {
        biasedConf :-= shift
        thermEnergies :-= shift
      }
    }

    var iter = 0
    var err = inf
    while (iter < maxIter && err > maxErr) {
      updateLagrangianMult()
      updateStateCounts()
      updateBiasedConfEnergies()
      updateThermEnergies()
      shiftToZeroMin()
      // iteration error: change in therm energies + stat vectors
      val oldStat = statVectors
      statVectors = DenseMatrix.tabulate(kT, n)((k, i) =>
        math.exp(thermEnergies(k) - biasedConf(k, i)))
      val e1 = breeze.linalg.max(breeze.numerics.abs(statVectors - oldStat))
      err = e1
      iter += 1
    }

    // markov state energies from samples (updateMarkovStateEnergies)
    updateStateCounts()
    val markovEnergies = sampleSums.markovEnergyUpdate(modStateCountsLog)
    // normalize: f0 = -logsumexp(-f_i)
    val f0 = -logsumexp(markovEnergies.toArray.map(-_), n)
    markovEnergies :-= f0
    biasedConf :-= f0
    thermEnergies :-= f0

    // transition matrices (computeTransitionMatrices)
    val tms = Array.tabulate(kT) { k =>
      val t = DenseMatrix.zeros[Double](n, n)
      val rowSums = new Array[Double](n)
      for (i <- 0 until n; j <- 0 until n) {
        val c = tc(k, i, j) + tc(k, j, i)
        if (c > 0) {
          if (i == j) t(i, i) = 0.5 * c * math.exp(-logV(k, i))
          else {
            val divisor = logsumexpPair(
              logV(k, j) - biasedConf(k, i), logV(k, i) - biasedConf(k, j))
            t(i, j) = c * math.exp(-(biasedConf(k, j) + divisor))
          }
          rowSums(i) += t(i, j)
        }
      }
      val maxSum = if (rowSums.forall(_ == 0)) 1.0 else rowSums.max
      for (i <- 0 until n; j <- 0 until n) {
        if (i == j) t(i, i) = (t(i, i) + maxSum - rowSums(i)) / maxSum
        else t(i, j) = t(i, j) / maxSum
      }
      // exact row normalization
      for (i <- 0 until n) {
        val rs = breeze.linalg.sum(t(i, ::).t)
        if (rs > 0) t(i, ::) :/= rs else t(i, i) = 1.0
      }
      t
    }
    TramModel(biasedConf, markovEnergies, thermEnergies, tms, iter, err,
      modStateCountsLog.copy)
  }

  /** Per-sample log statistical weights log μ(x) (reference
    * _tram_model.py:124 `compute_sample_weights_log` + tram.h:61):
    * appends `log_weight` to a sample frame (state INT, bias
    * ARRAY<DOUBLE> of length K), normalized so Σ exp(log_weight) = 1
    * over the frame (the reference wrapper's normalization).
    * thermState -1 gives the unbiased μ(x); k >= 0 gives μ^k(x).
    * Out-of-set samples (state < 0) get -inf, contributing zero weight.
    *
    * Distributed shape: log R^k_i and f^k enter as model-sized literals,
    * the raw weight is a pure column expression, and the normalizer is
    * one scalar logsumexp aggregate — samples never hit the driver. */
  def sampleWeightsLog(samples: DataFrame, model: TramModel,
                       thermState: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions._
    val kT = model.thermStateEnergies.length
    val n = model.biasedConfEnergies.cols
    val rByState: Seq[Seq[Double]] = (0 until n).map(i =>
      (0 until kT).map(l => model.modifiedStateCountsLog(l, i)))
    val rLit = typedLit(rByState)
    val terms = (0 until kT).map(l =>
      element_at(element_at(rLit, col("state") + 1), l + 1)
        - element_at(col("bias"), l + 1))
    // logsumexp over the K per-ensemble terms; exp(-inf - m) = 0 drops
    // ensembles with no modified counts at the state, like the C++ o-loop
    // in tram.h computeSampleWeightsLog. When ALL terms are -inf (the
    // sample's state has no modified counts in any ensemble), the bare
    // chain yields m = -inf, t - m = NaN, and raw = NaN — a single
    // trailing `nanvl(raw, -inf)` maps that to log_weight = -inf (zero
    // weight), exactly as the reference's o-loop leaves the divisor at
    // -inf and exp(-inf - ...) = 0. NO conditional around the K-term
    // subtree: wrapping it in `when` branches re-derives the whole
    // subtree per branch (Spark neither CSEs across conditionals nor
    // keeps the codegen tree small), which measured +2.5 s steady-state
    // on q252's three weight pipelines.
    val negInf = lit(Double.NegativeInfinity)
    val logDiv = if (kT == 1) terms.head else {
      val m = greatest(terms: _*)
      m + log(terms.map(t => exp(t - m)).reduce(_ + _))
    }
    val raw0 = if (thermState < 0) -logDiv
      else -element_at(col("bias"), thermState + 1) - logDiv +
        lit(model.thermStateEnergies(thermState))
    // kT == 1 has no logsumexp, so its all--inf case surfaces as
    // raw0 = +inf rather than NaN; both repair to -inf below. The repair
    // runs AFTER the checkpoint, on the materialized column: a NaN/+inf
    // row costs one trivial comparison there, while any guard placed
    // around `raw0` itself lands inside the checkpointed projection
    // where it measurably slows all three weight pipelines.
    val withRaw = graft.util.Materialize.frozen(
      samples.withColumn("lw_raw",
        when(col("state") < 0, negInf).otherwise(raw0)))
      // frozen: reused by the normalizer aggregate and the output
      .withColumn("lw_raw", when(isnan(col("lw_raw")) ||
        col("lw_raw") === lit(Double.PositiveInfinity), negInf)
        .otherwise(col("lw_raw")))
    val mRow = withRaw.agg(max(col("lw_raw")).as("m")).collect()(0)
    val mMax = if (mRow.isNullAt(0)) 0.0 else mRow.getDouble(0)
    if (mMax.isNegInfinity || mRow.isNullAt(0)) {
      // ALL-dead frame (every sample out-of-set or weight-zero): there
      // is no normalizer; -inf - logZ would be -inf - (-inf) = NaN for
      // any logZ we could form, so return the raw -inf weights as-is
      // (zero weight each, matching the reference's empty-measure case)
      withRaw.withColumn("log_weight", col("lw_raw")).drop("lw_raw")
    } else {
      val mShift = mMax
      val z = withRaw.agg(sum(exp(col("lw_raw") - mShift))).collect()(0).getDouble(0)
      val logZ = mShift + math.log(z)
      withRaw.withColumn("log_weight", col("lw_raw") - logZ).drop("lw_raw")
    }
  }

  /** Expected observable value under μ (reference _tram_model.py:163
    * `compute_observable`): Σ_x exp(log μ(x)) v(x). */
  def computeObservable(samples: DataFrame, model: TramModel,
                        valueCol: String, thermState: Int = -1): Double = {
    import org.apache.spark.sql.functions._
    sampleWeightsLog(samples, model, thermState)
      .agg(sum(exp(col("log_weight")) * col(valueCol)))
      .collect()(0).getDouble(0)
  }

  /** Potential of mean force over bins (reference _tram_model.py:198
    * `compute_PMF`): PMF_b = -log Σ_{x in b} exp(log μ(x)); empty bins
    * are +inf. Normalized weights lie in (0, 1], so the direct exp-sum
    * is safe at any realistic sample count. */
  def computePmf(samples: DataFrame, model: TramModel, binCol: String,
                 nBins: Int, thermState: Int = -1): Array[Double] = {
    import org.apache.spark.sql.functions._
    val perBin = sampleWeightsLog(samples, model, thermState)
      .groupBy(col(binCol)).agg(sum(exp(col("log_weight"))).as("wsum"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    Array.tabulate(nBins)(b =>
      perBin.get(b).map(w => -math.log(w)).getOrElse(inf))
  }

  /** Parameter-dependent part of the TRAM log-likelihood (reference
    * _tram_model.py:245 + tram.h computeDiscreteLikelihood /
    * computeLogLikelihood, Wu et al. 2016 Eq. 9): the discrete term
    * Σ_{ijk} c^k_ij log p^k_ij + Σ_{ik} N^k_i f^k_i plus the logsumexp
    * of the UNNORMALIZED sample weight logs. Driver-side over the
    * model-sized counts and the TramInput's (capped) sample table. */
  def logLikelihood(model: TramModel, input: TramInput): Double = {
    val kT = input.nTherm
    val n = input.nMarkov
    var ll = 0.0
    for (k <- 0 until kT; i <- 0 until n) {
      if (input.stateCounts(k)(i) > 0)
        ll += input.stateCounts(k)(i) * model.biasedConfEnergies(k, i)
      for (j <- 0 until n) {
        val c = input.transitionCounts(k)(i * n + j)
        if (c > 0) ll += c * math.log(model.transitionMatrices(k)(i, j))
      }
    }
    // raw (unnormalized) log weights over the sample table
    val scratch = new Array[Double](kT)
    val raws = input.samples.collect { case (i, b) if i >= 0 && i < n =>
      var o = 0
      for (l <- 0 until kT) {
        if (model.modifiedStateCountsLog(l, i) > -inf) {
          scratch(o) = model.modifiedStateCountsLog(l, i) - b(l)
          o += 1
        }
      }
      -logsumexp(scratch, o)
    }
    ll + logsumexp(raws, raws.length)
  }

  /** End-to-end: per-ensemble frames -> input assembly -> fixed point. */
  def fit(framesPerTherm: Seq[DataFrame], tau: Int, nMarkov: Int,
          maxIter: Int, maxErr: Double): TramModel =
    fit(inputFromFrames(framesPerTherm, tau, nMarkov), maxIter, maxErr, tau)

  /** The reference user workflow (_tram.py fit over a TRAMDataset):
    * dataset -> (optional prior connected-set restriction) -> fixed
    * point. Counts and the sample table come straight from the dataset's
    * bookkeeping; samples mapped to -1 by a restriction are excluded.
    * The lag is the dataset's OWN lagtime — the one its transition
    * counts were built at — so the model and its counts cannot drift. */
  def fit(dataset: TramDataset, maxIter: Int, maxErr: Double): TramModel = {
    val tau = dataset.lagtime
    val k = dataset.nThermStates
    val n = dataset.nMarkovStates
    val transitionCounts = dataset.transitionCounts
      .map(graft.linalg.LinAlg.toFlat)
    val stateCounts = dataset.stateCounts.map(_.map(_.toDouble))
    val samples = for {
      j <- dataset.dtrajs.indices.toArray
      t <- dataset.dtrajs(j).indices
      if dataset.dtrajs(j)(t) >= 0
    } yield (dataset.dtrajs(j)(t), dataset.biasMatrices(j)(t))
    fit(TramInput(k, n, transitionCounts, stateCounts, samples),
      maxIter, maxErr, tau)
  }
}
