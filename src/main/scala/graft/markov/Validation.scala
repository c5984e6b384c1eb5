package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Trajectories.{TrajCol, TimeCol}

/** Model validation workflows (reference util/validation.py:8
  * `implied_timescales`, :196 `ck_test`; markov/_observables.py:9
  * `MembershipsObservable`).
  *
  * Scale design: an ITS/CK scan needs count matrices at a GRID of lagtimes.
  * Estimating them one lag at a time re-reads the trajectory table once per
  * lag — at 100 TB that is the whole job cost multiplied by the grid size.
  * `multiLagCounts` instead computes every lag in ONE scan: one window pass
  * adds a `lead` column per lag, an array-of-structs explode stacks them,
  * and a single partially-aggregated groupBy(lag, s0, s1) shuffles at most
  * |lags| * n^2 rows regardless of input size.
  */
object Validation {

  private def w = Window.partitionBy(TrajCol).orderBy(TimeCol)

  /** Sliding-window transition counts for every lag in `lags`, one scan.
    * Output columns: lag, s0, s1, cnt. Blank states (-1) excluded. */
  def multiLagCounts(dtraj: DataFrame, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), "lags must be positive")
    val withLeads = lags.foldLeft(dtraj) { (df, tau) =>
      df.withColumn(s"s1_$tau", lead(col("state"), tau).over(w))
    }
    val stacked = array(lags.map(tau =>
      struct(lit(tau).as("lag"), col(s"s1_$tau").as("s1"))): _*)
    withLeads
      .select(col("state").as("s0"), explode(stacked).as("p"))
      .select(col("p.lag").as("lag"), col("s0"), col("p.s1").as("s1"))
      .where(col("s1").isNotNull && col("s0") >= 0 && col("s1") >= 0)
      .groupBy("lag", "s0", "s1")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Implied-timescales data over a lag grid (util/validation.py:56
    * `ImpliedTimescales`): `its(l)(p)` = timescale of process p at
    * `lagtimes(l)`; NaN-padded where a model yields fewer processes. */
  case class ItsData(lagtimes: Array[Int], its: Array[Array[Double]]) {
    def nLagtimes: Int = lagtimes.length
    def maxNProcesses: Int = if (its.isEmpty) 0 else its.map(_.length).max
    def timescalesForProcess(p: Int): Array[Double] =
      its.map(row => if (p < row.length) row(p) else Double.NaN)
  }

  /** Estimate an MSM per lagtime from ONE scan and report implied
    * timescales (validation.py:8). `k` = number of processes (excludes the
    * stationary one). */
  def impliedTimescales(dtraj: DataFrame, lags: Seq[Int], nStates: Int,
                        k: Int = -1, reversible: Boolean = true): ItsData = {
    val models = msmPerLag(dtraj, lags, nStates, reversible)
    val sorted = lags.sorted
    ItsData(sorted.toArray,
      sorted.map(l => models(l).timescales(k).toArray).toArray)
  }

  /** Implied timescales WITH Bayesian error bars (validation.py:40-52: the
    * `its_stats` surface for models carrying posterior samples): per lag,
    * effective-count Bayesian posteriors drive sampled timescales.
    * `itsStats(l)(p)` holds the posterior draws for process p at lag l. */
  case class BayesianItsData(lagtimes: Array[Int], its: Array[Array[Double]],
                             itsStats: Array[Array[Array[Double]]]) {
    def ci(l: Int, p: Int, conf: Double = 0.95): (Double, Double) =
      graft.util.Stats.confidenceInterval(itsStats(l)(p).toSeq, conf)
  }

  def impliedTimescalesBayesian(dtraj: DataFrame, lags: Seq[Int], nStates: Int,
                                k: Int = 2, nSamples: Int = 50, seed: Long = 42L,
                                reversible: Boolean = true,
                                useEffectiveCounts: Boolean = true,
                                maxLag: Int = 50): BayesianItsData = {
    val sorted = lags.sorted
    val results = sorted.map { tau =>
      val post = BayesianMsm.fit(dtraj, tau, nStates, nSamples,
        reversible = reversible, seed = seed + tau,
        useEffectiveCounts = useEffectiveCounts, maxLag = maxLag)
      val mlTs = post.prior.timescales(k).toArray
      val sampleTs = post.samples.map(_.timescales(k).toArray)
      val stats = Array.tabulate(k)(p =>
        sampleTs.collect { case ts if p < ts.length => ts(p) }.toArray)
      (mlTs, stats)
    }
    BayesianItsData(sorted.toArray, results.map(_._1).toArray,
      results.map(_._2).toArray)
  }

  /** All per-lag MSMs from a single multi-lag scan. */
  def msmPerLag(dtraj: DataFrame, lags: Seq[Int], nStates: Int,
                reversible: Boolean): Map[Int, MarkovStateModel] = {
    val rows = multiLagCounts(dtraj, lags).collect()
    val byLag = rows.groupBy(_.getInt(0))
    lags.map { tau =>
      val dense = DenseMatrix.zeros[Double](nStates, nStates)
      byLag.getOrElse(tau, Array.empty).foreach { r =>
        dense(r.getInt(1), r.getInt(2)) = r.getLong(3).toDouble
      }
      val lcs = Connectivity.largestConnectedSet(dense)
      val sub = Connectivity.submatrix(dense, lcs)
      val t = if (reversible) TransitionMatrixMle.reversible(sub)
              else TransitionMatrixMle.nonReversible(sub)
      tau -> MarkovStateModel(t, tau, lcs)
    }.toMap
  }

  /** CK test WITH posterior samples on the predictions (validation.py:257
    * `err_est` path): the test model's Bayesian samples are each propagated
    * through the membership observable, giving per-lag sampled coarse
    * propagators for confidence bands. */
  case class BayesianCkResult(base: CkTestResult,
                              predictionSamples: Array[Seq[DenseMatrix[Double]]])

  def ckTestBayesian(dtraj: DataFrame, tau: Int, steps: Int, nStates: Int,
                     nSets: Int, nSamples: Int = 30, seed: Long = 42L,
                     reversible: Boolean = true,
                     useEffectiveCounts: Boolean = true,
                     maxLag: Int = 50): BayesianCkResult = {
    val base = ckTest(dtraj, tau, steps, nStates, nSets, reversible)
    val post = BayesianMsm.fit(dtraj, tau, nStates, nSamples,
      reversible = reversible, seed = seed,
      useEffectiveCounts = useEffectiveCounts, maxLag = maxLag)
    // reuse the test model's membership construction: observables are built
    // against the PRIOR (ML) model's sets, samples share its active set
    val test = post.prior
    val pcca = Pcca(test, nSets)
    val m = pcca.memberships
    val pi = test.stationaryDistribution
    val p0 = DenseMatrix.tabulate(test.n, nSets)((s, i) => m(s, i) * pi(s))
    (0 until nSets).foreach { i =>
      val s = breeze.linalg.sum(p0(::, i))
      if (s > 0) p0(::, i) :/= s
    }
    def propagated(model: MarkovStateModel, mlag: Int): DenseMatrix[Double] = {
      val out = DenseMatrix.zeros[Double](nSets, nSets)
      for (i <- 0 until nSets) {
        var pk = p0(::, i).copy
        (0 until mlag).foreach(_ => pk = model.transitionMatrix.t * pk)
        for (j <- 0 until nSets) out(i, j) = pk dot m(::, j)
      }
      out
    }
    val samples = base.lagtimes.map { l =>
      if (l == 0) Seq.fill(nSamples)(DenseMatrix.eye[Double](nSets))
      else post.samples.map(s => propagated(s, l / tau))
    }
    BayesianCkResult(base, samples)
  }

  /** Chapman-Kolmogorov test result (validation.py:284
    * `ChapmanKolmogorovTest`): `predictions(l)` is the coarse-grained
    * propagator of the test model powered to `lagtimes(l)/tau`;
    * `estimates(l)` the same observable on the model re-estimated at
    * `lagtimes(l)`. */
  case class CkTestResult(lagtimes: Array[Int], nSets: Int,
                          predictions: Array[DenseMatrix[Double]],
                          estimates: Array[DenseMatrix[Double]])

  /** CK test with PCCA-membership observables over `nSets` metastable sets
    * (validation.py:196 + _observables.py:9). Count matrices for the whole
    * k*tau grid come from one scan. */
  def ckTest(dtraj: DataFrame, tau: Int, steps: Int, nStates: Int, nSets: Int,
             reversible: Boolean = true, includeLag0: Boolean = true): CkTestResult = {
    require(steps >= 1)
    val lags = (1 to steps).map(_ * tau)
    val models = msmPerLag(dtraj, lags, nStates, reversible)
    val test = models(tau)
    val pcca = Pcca(test, nSets)
    val m = pcca.memberships // test.n x nSets
    val pi = test.stationaryDistribution

    // P0[:, i] = memberships(:, i) * pi, column-normalized
    // (_observables.py:43-45)
    val p0 = DenseMatrix.tabulate(test.n, nSets)((s, i) => m(s, i) * pi(s))
    (0 until nSets).foreach { i =>
      val s = bsum(p0(::, i))
      if (s > 0) p0(::, i) :/= s
    }
    // full symbol -> test-model active index
    val full2test = test.states.zipWithIndex.toMap

    def observable(model: MarkovStateModel, mlag: Int): DenseMatrix[Double] = {
      if (mlag == 0 || model == null) return DenseMatrix.eye[Double](nSets)
      // The starting distribution lives on the model's OWN active set
      // (zero mass on symbols the test model doesn't know), and is
      // propagated with the model's full row-stochastic matrix — restricting
      // the matrix instead would leak probability mass
      // (_observables.py:64-71 maps through full2active the same way).
      val out = DenseMatrix.zeros[Double](nSets, nSets)
      for (i <- 0 until nSets) {
        var pk = DenseVector.tabulate(model.n)(mi =>
          full2test.get(model.states(mi)).map(ti => p0(ti, i)).getOrElse(0.0))
        (0 until mlag).foreach(_ => pk = model.transitionMatrix.t * pk)
        for (j <- 0 until nSets) {
          var acc = 0.0
          var a = 0
          while (a < model.n) {
            full2test.get(model.states(a)).foreach(ti => acc += pk(a) * m(ti, j))
            a += 1
          }
          out(i, j) = acc
        }
      }
      out
    }

    val lagtimes = (if (includeLag0) Array(0) else Array.empty[Int]) ++ lags
    val predictions = lagtimes.map(l => observable(test, l / tau))
    val estimates = lagtimes.map(l =>
      if (l == 0) observable(null, 0) else observable(models(l), 1))
    CkTestResult(lagtimes, nSets, predictions, estimates)
  }

  /** CK test over CRISP state sets with EMPIRICAL visitation weights — the
    * SQL-expressible counterpart of the PCCA-membership `ckTest` above
    * (reference validation.py:196 allows arbitrary observables; crisp-set
    * indicator observables are its simplest instance). Every quantity is a
    * ratio of pair counts: estimates are coarse-grained row-normalized
    * count matrices at lag l*tau, predictions coarse-grain the l-th matrix
    * power of the lag-tau matrix, and the starting weights w_i are the
    * state histogram restricted to each set. A DuckDB oracle recomputes
    * the whole grid exactly (matrix powers = n^2-row self-joins). */
  def ckTestSets(dtraj: DataFrame, tau: Int, steps: Int, nStates: Int,
                 sets: Seq[Set[Int]]): CkTestResult = {
    require(steps >= 1)
    val lags = (1 to steps).map(_ * tau)
    // RAW row-normalized count matrices over the full 0..nStates-1 frame
    // (zero rows for states without outgoing pairs at that lag) — NO
    // largest-connected-set restriction: the SQL twin sums over all
    // observed pairs, and an LCS-restricted model would silently diverge
    // from it on data where a state drops out of the LCS at some lag.
    val rows = multiLagCounts(dtraj, lags).collect()
    val byLag = rows.groupBy(_.getInt(0))
    val tms: Map[Int, DenseMatrix[Double]] = lags.map { l =>
      val c = DenseMatrix.zeros[Double](nStates, nStates)
      byLag.getOrElse(l, Array.empty).foreach { r =>
        c(r.getInt(1), r.getInt(2)) = r.getLong(3).toDouble
      }
      for (i <- 0 until nStates) {
        val rs = bsum(c(i, ::).t)
        if (rs > 0) c(i, ::) :/= rs
      }
      l -> c
    }.toMap
    val hist: Map[Int, Double] = dtraj.where(col("state") >= 0)
      .groupBy("state").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val nSets = sets.length

    def coarse(t: DenseMatrix[Double]): DenseMatrix[Double] = {
      val out = DenseMatrix.zeros[Double](nSets, nSets)
      for (a <- 0 until nSets; b <- 0 until nSets) {
        var num = 0.0
        var den = 0.0
        for (i <- 0 until nStates if sets(a).contains(i)) {
          val wi = hist.getOrElse(i, 0.0)
          den += wi
          var srow = 0.0
          for (j <- 0 until nStates if sets(b).contains(j)) srow += t(i, j)
          num += wi * srow
        }
        out(a, b) = if (den > 0) num / den else 0.0
      }
      out
    }

    val base = tms(tau)
    def power(t: DenseMatrix[Double], p: Int): DenseMatrix[Double] = {
      var acc = DenseMatrix.eye[Double](t.rows)
      (0 until p).foreach(_ => acc = acc * t)
      acc
    }
    val lagtimes = Array(0) ++ lags
    val predictions = lagtimes.map {
      case 0 => DenseMatrix.eye[Double](nSets)
      case l => coarse(power(base, l / tau))
    }
    val estimates = lagtimes.map {
      case 0 => DenseMatrix.eye[Double](nSets)
      case l => coarse(tms(l))
    }
    CkTestResult(lagtimes, nSets, predictions, estimates)
  }
}
