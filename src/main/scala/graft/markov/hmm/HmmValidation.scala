package graft.markov.hmm

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import graft.markov.Validation.CkTestResult

/** Chapman-Kolmogorov test for hidden Markov models
  * (reference markov/hmm/_hidden_markov_model.py:313 `ck_test` +
  * markov/_observables.py:9 `MembershipsObservable` with
  * `memberships = eye(n_hidden)` and the hidden stationary distribution
  * as the initial distribution).
  *
  * With identity memberships, P0[:, i] = e_i after column normalization
  * (P0[s, i] = delta_si * pi_i, normalized per column), so the membership
  * observable of a model at `mlag` steps is EXACTLY its hidden transition
  * matrix power A^mlag. The CK grid therefore compares:
  *   predictions(k) = A_test^k      (test model propagated)
  *   estimates(k)   = A_{k*tau}     (HMM re-estimated at lag k*tau)
  *
  * Hidden-state labels of independently-EM-estimated models are gauge —
  * label switching across runs would break the element-wise comparison
  * while being physically meaningless — so each lag model is aligned to
  * the test model by the emission-overlap-maximizing permutation (the
  * reference gets alignment implicitly from its MSM+PCCA init heuristic
  * per lag; we make it explicit and deterministic).
  */
object HmmValidation {

  private def matPow(a: DenseMatrix[Double], p: Int): DenseMatrix[Double] = {
    var acc = DenseMatrix.eye[Double](a.rows)
    (0 until p).foreach(_ => acc = acc * a)
    acc
  }

  /** Permutation (model label -> test label) maximizing total emission
    * row overlap; exhaustive over nHidden! (nHidden is 2-6 in practice). */
  private[hmm] def alignPermutation(bTest: DenseMatrix[Double],
                                    bModel: DenseMatrix[Double]): Array[Int] = {
    val m = bTest.rows
    val overlap = Array.tabulate(m, m) { (k, t) =>
      var acc = 0.0
      var o = 0
      while (o < bTest.cols) { acc += bModel(k, o) * bTest(t, o); o += 1 }
      acc
    }
    (0 until m).permutations
      .maxBy(p => (0 until m).map(k => overlap(k)(p(k))).sum)
      .toArray
  }

  /** Apply a label permutation to an HMM: A'(p(i),p(j)) = A(i,j), etc. */
  private[hmm] def permute(model: Hmm.HmmModel, p: Array[Int]): Hmm.HmmModel = {
    val m = model.transition.rows
    val a = DenseMatrix.zeros[Double](m, m)
    val b = DenseMatrix.zeros[Double](m, model.emission.cols)
    val pi = DenseVector.zeros[Double](m)
    for (i <- 0 until m) {
      pi(p(i)) = model.initial(i)
      for (j <- 0 until m) a(p(i), p(j)) = model.transition(i, j)
      for (o <- 0 until model.emission.cols) b(p(i), o) = model.emission(i, o)
    }
    model.copy(transition = a, emission = b, initial = pi)
  }

  /** Every l-th frame of each trajectory BY POSITION. This equals the
    * distributed `Hmm.fit` stride (`t % lagtime === 0`) only when each
    * array's positions coincide with its t values — i.e. t is contiguous
    * from 0 with no gaps. Callers holding gap-filtered dtrajs (blank
    * states removed AFTER t assignment) get a position-strided CK test of
    * the compressed sequences — a valid CK contract, but not frame-level
    * identical to `ckTest` on the gapped frame; the parity spec uses
    * contiguous t for this reason. Empty strided arrays are dropped
    * (forwardBackward needs >= 1 frame); length-1 arrays are kept, like
    * the distributed path. */
  private def stride(trajs: Seq[Array[Int]], l: Int): Seq[Array[Int]] =
    if (l == 1) trajs.filter(_.nonEmpty)
    else trajs.map { arr =>
      val out = new Array[Int]((arr.length + l - 1) / l)
      var i = 0
      while (i * l < arr.length) { out(i) = arr(i * l); i += 1 }
      out
    }.filter(_.nonEmpty)

  /** Driver-local HMM CK test from collected observation arrays — one
    * `Hmm.fitArrays` per lag, zero Spark jobs (the q73-battery path). */
  def ckTestArrays(trajs: Seq[Array[Int]], nHidden: Int, nObs: Int,
                   tau: Int, steps: Int, maxIter: Int = 50,
                   includeLag0: Boolean = true): CkTestResult = {
    require(steps >= 1)
    val lags = (1 to steps).map(_ * tau)
    val models = lags.map { l =>
      // init from SLIDING (all-t) counts at lag l like the distributed
      // `Hmm.fit` (its initialGuess uses slidingCounts(dtraj, l) before
      // striding), keeping the two paths numerically identical
      val init = Hmm.initialGuessFromCounts(
        graft.markov.TransitionCounting.slidingCountsLocal(trajs, l, nObs),
        nHidden, nObs, l)
      l -> Hmm.fitArrays(stride(trajs, l), nHidden, nObs, maxIter,
        init = Some(init))
    }.toMap
    buildResult(models, tau, steps, includeLag0)
  }

  /** Distributed HMM CK test — one `Hmm.fit` (EM over the cluster) per
    * lag; the scale path for corpus-sized dtrajs. */
  def ckTest(dtraj: DataFrame, nHidden: Int, nObs: Int, tau: Int,
             steps: Int, maxIter: Int = 50,
             includeLag0: Boolean = true): CkTestResult = {
    require(steps >= 1)
    val lags = (1 to steps).map(_ * tau)
    val models = lags.map(l =>
      l -> Hmm.fit(dtraj, nHidden, nObs, lagtime = l, maxIter = maxIter)).toMap
    buildResult(models, tau, steps, includeLag0)
  }

  private def buildResult(models: Map[Int, Hmm.HmmModel], tau: Int,
                          steps: Int, includeLag0: Boolean): CkTestResult = {
    val test = models(tau)
    val nSets = test.transition.rows
    val aligned = models.map { case (l, m) =>
      l -> (if (l == tau) m else permute(m, alignPermutation(test.emission, m.emission)))
    }
    val lagtimes = (if (includeLag0) Array(0) else Array.empty[Int]) ++
      (1 to steps).map(_ * tau)
    val predictions = lagtimes.map {
      case 0 => DenseMatrix.eye[Double](nSets)
      case l => matPow(test.transition, l / tau)
    }
    val estimates = lagtimes.map {
      case 0 => DenseMatrix.eye[Double](nSets)
      case l => aligned(l).transition
    }
    CkTestResult(lagtimes, nSets, predictions, estimates)
  }
}
