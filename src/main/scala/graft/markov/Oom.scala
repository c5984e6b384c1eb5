package graft.markov

import breeze.linalg.{DenseMatrix, DenseVector, sum => bsum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Trajectories.{TrajCol, TimeCol}
import graft.linalg.LinAlg

/** OOM-based (Koopman-reweighted) MSM estimation — "unbiased MSMs from
  * short trajectories" (reference markov/msm/_koopman_reweighted_msm.py +
  * _koopman_reweighted_msm_impl.py:124-337; Nueske et al. JCP 2017).
  *
  * Distributed shape: the data-sized inputs are the one-step count matrix
  * and the TWO-STEP count tensor C2t[i,n,j] = #(s_t=i, s_{t+tau}=n,
  * s_{t+2tau}=j); both come from ONE window pass (two lead columns) and a
  * single groupBy of at most N^3 aggregated rows. The OOM algebra (SVD,
  * set-observable operators, equilibrium correction) is driver-side at
  * model size. */
object Oom {

  case class OomModel(
      transitionMatrix: DenseMatrix[Double],   // equilibrium-corrected, on lcc
      states: Array[Int],                      // retained state labels
      oomEigenvalues: Array[Double],           // real parts, sorted by |.| desc
      oomRank: Int,
      sigma: DenseVector[Double],
      omega: DenseVector[Double],
      tau: Int) {
    def msm: MarkovStateModel = MarkovStateModel(transitionMatrix, tau, states)
    def oomTimescales: Seq[Double] =
      LinAlg.timescales(oomEigenvalues.drop(1).toSeq, tau.toDouble)
  }

  /** Two-step transition counts in COO form (s0, s1, s2, cnt), one scan. */
  def twoStepCounts(dtraj: DataFrame, tau: Int): DataFrame = {
    val w = Window.partitionBy(TrajCol).orderBy(TimeCol)
    dtraj
      .withColumn("s1", lead(col("state"), tau).over(w))
      .withColumn("s2", lead(col("state"), 2 * tau).over(w))
      .where(col("s1").isNotNull && col("s2").isNotNull &&
        col("state") >= 0 && col("s1") >= 0 && col("s2") >= 0)
      .groupBy(col("state").as("s0"), col("s1"), col("s2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Rank decision from multinomial-bootstrap singular-value uncertainty
    * (impl:81 `bootstrapping_count_matrix` + :164 `rank_decision`): accept
    * sigma_i with signal-to-noise mean/std >= tol. */
  def bootstrapRank(ct: DenseMatrix[Double], nbs: Int = 200, tol: Double = 10.0,
                    seed: Long = 42L): Array[Boolean] = {
    val n = ct.rows
    val total = bsum(ct)
    val flat = ct.t.toArray // column-major of transpose = row-major
    val probs = flat.map(_ / total)
    val rng = new java.util.SplittableRandom(seed)
    val svals = Array.ofDim[Double](nbs, n)
    val nDraw = math.max(1, total.toLong)
    for (b <- 0 until nbs) {
      // multinomial resample of the count matrix
      val sample = new Array[Double](flat.length)
      // inverse-CDF draws (nDraw can be large; use gaussian approx above 1e6)
      if (nDraw <= 200000) {
        var d = 0L
        while (d < nDraw) {
          val u = rng.nextDouble()
          var acc = 0.0
          var i = 0
          var found = false
          while (i < probs.length && !found) {
            acc += probs(i)
            if (u < acc) { sample(i) += 1.0; found = true }
            i += 1
          }
          if (!found) sample(probs.length - 1) += 1.0
          d += 1
        }
      } else {
        // normal approximation to the multinomial cell counts
        for (i <- probs.indices) {
          val mu = nDraw * probs(i)
          val sd = math.sqrt(math.max(mu * (1 - probs(i)), 0.0))
          sample(i) = math.max(0.0, mu + sd * rng.nextGaussian())
        }
      }
      val m = DenseMatrix.zeros[Double](n, n)
      for (i <- 0 until n; j <- 0 until n) m(i, j) = sample(i * n + j)
      val sv = breeze.linalg.svd(m).singularValues
      for (i <- 0 until n) svals(b)(i) = sv(i)
    }
    Array.tabulate(n) { i =>
      val vals = (0 until nbs).map(svals(_)(i))
      val mean = vals.sum / nbs
      val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / math.max(1, nbs - 1))
      sd > 0 && mean / sd >= tol
    }
  }

  /** Two-step counts from already-collected trajectory arrays (zero Spark
    * jobs; same semantics as `twoStepCounts`). COO (s0, s1, s2, cnt). */
  def twoStepCountsLocal(trajs: Iterable[Array[Int]], tau: Int): Seq[(Int, Int, Int, Double)] = {
    val acc = scala.collection.mutable.HashMap.empty[(Int, Int, Int), Double]
    trajs.foreach { arr =>
      var i = 0
      while (i + 2 * tau < arr.length) {
        val a = arr(i); val b = arr(i + tau); val c = arr(i + 2 * tau)
        if (a >= 0 && b >= 0 && c >= 0) {
          val k = (a, b, c)
          acc(k) = acc.getOrElse(k, 0.0) + 1.0
        }
        i += 1
      }
    }
    acc.iterator.map { case ((a, b, c), v) => (a, b, c, v) }.toSeq
  }

  /** Full OOM estimation from a dtraj frame: the two data-sized inputs
    * (one-step counts, two-step COO tensor) are Spark jobs; the algebra
    * delegates to `fitFromCounts`. */
  def fit(dtraj: DataFrame, tau: Int, nStates: Int, reversible: Boolean = true,
          rankTol: Double = 10.0, nbs: Int = 200, tolOne: Double = 1e-2,
          seed: Long = 42L): OomModel = {
    val ct0 = TransitionCounting.toDense(
      TransitionCounting.slidingCounts(dtraj, tau), nStates)
    val c2tCoo = twoStepCounts(dtraj, tau).collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3).toDouble))
    fitFromCounts(ct0, c2tCoo, tau, reversible, rankTol, nbs, tolOne, seed)
  }

  /** OOM algebra from already-collected counts (one-step dense + two-step
    * COO in original state labels). Driver-side at model size; callers that
    * already hold the dtraj pay zero extra Spark jobs. */
  def fitFromCounts(ct0: DenseMatrix[Double], c2tCoo: Seq[(Int, Int, Int, Double)],
                    tau: Int, reversible: Boolean = true, rankTol: Double = 10.0,
                    nbs: Int = 200, tolOne: Double = 1e-2,
                    seed: Long = 42L): OomModel = {
    val lcc = Connectivity.largestConnectedSet(ct0)
    val ct = Connectivity.submatrix(ct0, lcc)
    val n = lcc.length
    val lccIdx = lcc.zipWithIndex.toMap

    // two-step tensor restricted to the lcc
    val c2t = Array.fill(n)(DenseMatrix.zeros[Double](n, n)) // per intermediate state
    c2tCoo.foreach { case (s0, s1, s2, cnt) =>
      (lccIdx.get(s0), lccIdx.get(s1), lccIdx.get(s2)) match {
        case (Some(i), Some(m), Some(j)) => c2t(m)(i, j) += cnt
        case _ =>
      }
    }

    // SVD of Ct + bootstrap rank decision (impl:189 `oom_components`)
    val svdR = breeze.linalg.svd(ct)
    val rankInd = bootstrapRank(ct, nbs, rankTol, seed)
    val keep = (0 until n).filter(i => rankInd(i) && svdR.singularValues(i) > 1e-12)
    require(keep.nonEmpty, "OOM rank decision rejected all singular values; lower rankTol")
    val mRank = keep.length
    val f1 = DenseMatrix.tabulate(n, mRank)((i, k) =>
      svdR.leftVectors(i, keep(k)) / math.sqrt(svdR.singularValues(keep(k))))
    val f2 = DenseMatrix.tabulate(n, mRank)((i, k) =>
      svdR.rightVectors(keep(k), i) / math.sqrt(svdR.singularValues(keep(k))))

    // Xi[:, m, :] = F1' C2t_m F2
    val xi = Array.tabulate(n)(m => f1.t * c2t(m) * f2)
    val sigma = f1.t * DenseVector.tabulate(n)(i => bsum(ct(i, ::).t))
    val xiS = xi.reduce(_ + _)
    val e = breeze.linalg.eig(xiS.t)
    val valid = (0 until mRank).filter { i =>
      val mag = math.hypot(e.eigenvalues(i), e.eigenvaluesComplex(i))
      mag <= 1.0 + tolOne && e.eigenvalues(i) >= 0.0
    }
    require(valid.nonEmpty, "no valid OOM eigenvalues")
    val sortedIdx = valid.sortBy(i => -math.hypot(e.eigenvalues(i), e.eigenvaluesComplex(i)))
    val oomEigs = sortedIdx.map(e.eigenvalues(_)).toArray
    var omega = DenseVector.tabulate(mRank)(i => e.eigenvectors(i, sortedIdx.head))
    omega = omega / (omega dot sigma)

    // equilibrium correction (impl:271): Ct_Eq[k,m] = omega' Xi_k Xi_m sigma
    val xiOmega = Array.tabulate(n)(k => xi(k).t * omega)   // (M) per k
    val xiSigma = Array.tabulate(n)(m => xi(m) * sigma)     // (M) per m
    val ctEq = DenseMatrix.tabulate(n, n)((k, m) => math.max(0.0, xiOmega(k) dot xiSigma(m)))
    val piR = DenseVector.tabulate(n)(i => bsum(ctEq(i, ::).t))
    val tEq =
      if (reversible) {
        val piC = DenseVector.tabulate(n)(j => bsum(ctEq(::, j)))
        val piSym = piR + piC
        DenseMatrix.tabulate(n, n) { (i, j) =>
          val d = if (piSym(i) == 0.0) 1.0 else piSym(i)
          (ctEq(i, j) + ctEq(j, i)) / d
        }
      } else {
        DenseMatrix.tabulate(n, n) { (i, j) =>
          val d = if (piR(i) == 0.0) 1.0 else piR(i)
          ctEq(i, j) / d
        }
      }
    // active-set update on the corrected matrix
    val lcc2 = Connectivity.largestConnectedSet(tEq)
    val tFinal = Connectivity.submatrix(tEq, lcc2)
    // rows normalize exactly (symmetrized division can be slightly off)
    for (i <- 0 until tFinal.rows) {
      val rs = bsum(tFinal(i, ::).t)
      if (rs > 0) tFinal(i, ::) :/= rs else tFinal(i, i) = 1.0
    }
    OomModel(tFinal, lcc2.map(lcc(_)), oomEigs, mRank, sigma, omega, tau)
  }
}
