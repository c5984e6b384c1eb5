package graft.markov

import breeze.linalg.DenseMatrix

/** Per-therm-state count model over symbols 0..(maxObserved): counts +
  * histogram; empty model (all zero over the full M) when no fragment
  * is longer than the lagtime (_tram_dataset.py:569). */
case class TramCountModel(counts: DenseMatrix[Double], histogram: Array[Long])

/** TRAM dataset bookkeeping and connected-set restriction (reference
  * markov/msm/tram/_tram_dataset.py, overlap kernels
  * src/include/deeptime/markov/msm/tram/connected_set.h, fragment mapping
  * trajectory_mapping.h).
  *
  * Organizes multi-ensemble discrete trajectories + per-sample bias
  * energies, computes per-thermodynamic-state count models (splitting
  * trajectories at replica-exchange swap points), and restricts the data
  * to the largest connected set of Markov states under one of three
  * connectivity criteria:
  *
  *  - "post_hoc_RE": thermodynamic states k,l overlap at Markov state i
  *    if the estimated replica-exchange acceptance between their samples
  *    in i is high enough ((n+m)·avg(min(e^Δ,1))·factor ≥ 1).
  *  - "BAR_variance": overlap if the BAR free-energy-difference variance
  *    over the same samples is below the factor.
  *  - "summed_count_matrix": all ensembles assumed to overlap; largest
  *    SCC of the summed count matrix (edges with count ≥ factor).
  *
  * Scale note: this mirrors the reference's own driver-side layer — all
  * state here is model-sized (K ensembles × M Markov states; trajectories
  * for TRAM fixtures are collected once, same contract as Tram.fit). The
  * DISTRIBUTED formulation of the pairwise overlap statistic lives in
  * `TramDataset.postHocOverlap` (one self-join on the Markov state, used
  * by q245), which never collects the sample table.
  */
final class TramDataset(
    dtrajs0: Array[Array[Int]],
    val biasMatrices: Array[Array[Array[Double]]], // traj -> sample -> K
    val ttrajs: Option[Array[Array[Int]]] = None,
    nThermStatesOpt: Option[Int] = None,
    nMarkovStatesOpt: Option[Int] = None,
    val lagtime: Int = 1,
    val countMode: String = "sliding") {

  import TramDataset._

  private var _dtrajs: Array[Array[Int]] = dtrajs0.map(_.clone())

  def dtrajs: Array[Array[Int]] = _dtrajs

  // structural checks FIRST, so degenerate inputs fail with these messages
  // rather than an opaque empty.max from the derived-size initializers
  require(_dtrajs.nonEmpty, "need at least one trajectory")
  require(_dtrajs.forall(_.nonEmpty), "trajectories must be non-empty")
  require(_dtrajs.length == biasMatrices.length,
    "number of trajectories != number of bias matrices")
  ttrajs.foreach { ts =>
    require(ts.length == _dtrajs.length, "number of ttrajs is not equal to number of dtrajs")
    require(ts.forall(_.nonEmpty), "ttrajs must be non-empty")
    ts.indices.foreach(i => require(ts(i).length == _dtrajs(i).length,
      s"ttraj $i and dtraj $i must be of equal length"))
  }

  val nThermStates: Int = nThermStatesOpt.getOrElse(
    ttrajs match {
      case Some(ts) => ts.map(_.max).max + 1
      case None => _dtrajs.length
    })
  val nMarkovStates: Int = nMarkovStatesOpt.getOrElse(_dtrajs.map(_.max).max + 1)

  _dtrajs.indices.foreach { i =>
    require(_dtrajs(i).length == biasMatrices(i).length,
      s"dtraj $i and bias matrix $i must be of equal length")
    require(biasMatrices(i).forall(_.length == nThermStates),
      s"bias matrix $i second dimension must be nThermStates=$nThermStates")
    require(_dtrajs(i).length > lagtime, s"trajectory $i shorter than lagtime")
  }

  private var _countModels: Array[TramCountModel] = computeCounts()

  def countModels: Array[TramCountModel] = _countModels

  /** K × M state histogram, zero-padded (_tram_dataset.py state_counts). */
  def stateCounts: Array[Array[Long]] = {
    val out = Array.fill(nThermStates)(new Array[Long](nMarkovStates))
    for (k <- 0 until nThermStates; i <- _countModels(k).histogram.indices)
      out(k)(i) = _countModels(k).histogram(i)
    out
  }

  /** K × M × M transition counts, zero-padded. */
  def transitionCounts: Array[DenseMatrix[Double]] = {
    Array.tabulate(nThermStates) { k =>
      val m = DenseMatrix.zeros[Double](nMarkovStates, nMarkovStates)
      val c = _countModels(k).counts
      for (i <- 0 until c.rows; j <- 0 until c.cols) m(i, j) = c(i, j)
      m
    }
  }

  /** Markov-state symbols of the largest connected set under the given
    * connectivity mode — the `cset.state_symbols` of the reference's
    * `_find_largest_connected_set`, sorted ascending. */
  def largestConnectedSet(connectivity: String,
                          connectivityFactor: Double = 1.0): Array[Int] = connectivity match {
    case "summed_count_matrix" =>
      // sum of per-dtraj sliding counts, ignoring thermodynamic indices;
      // largest directed SCC with edges where count >= factor
      val summed = countTrajectory(_dtrajs, lagtime, countMode,
        _dtrajs.map(t => maxOrMinus1(t)).max + 1)
      largestSccThreshold(summed.counts, connectivityFactor)
    case "post_hoc_RE" | "BAR_variance" =>
      val nM = nMarkovStates
      val nK = nThermStates
      // per-TRAJECTORY histograms indexed as therm states — replicates the
      // reference's all_state_counts construction (_tram_dataset.py:433),
      // which assumes trajectory k ↔ thermodynamic state k for the gate
      val perTrajHist = Array.tabulate(_dtrajs.length) { k =>
        val h = new Array[Long](nM)
        _dtrajs(k).foreach(s => if (s >= 0) h(s) += 1)
        h
      }
      val edges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // overlap edges (k·M+i) -> (l·M+i) per connected_set.h findStateTransitions
      for (i <- 0 until nM) {
        // all (traj, n) sample slots of Markov state i, per therm state
        val samplesPerTherm = Array.fill(nK)(
          scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
        for (j <- _dtrajs.indices; n <- _dtrajs(j).indices
             if _dtrajs(j)(n) == i) {
          val k = ttrajs.map(_(j)(n)).getOrElse(j)
          samplesPerTherm(k) += ((j, n))
        }
        for (k <- 0 until nK if k < perTrajHist.length && perTrajHist(k)(i) > 0;
             l <- 0 until nK
             if l != k && l < perTrajHist.length && perTrajHist(l)(i) > 0) {
          val atK = samplesPerTherm(k).toArray.map { case (j, n) =>
            (biasMatrices(j)(n)(k), biasMatrices(j)(n)(l)) }
          val atL = samplesPerTherm(l).toArray.map { case (j, n) =>
            (biasMatrices(j)(n)(k), biasMatrices(j)(n)(l)) }
          val overlap = connectivity match {
            case "post_hoc_RE" => postHocOverlapTest(atK, atL, connectivityFactor)
            case _ => barVarianceOverlapTest(atK, atL, connectivityFactor)
          }
          if (overlap) edges += ((k * nM + i, l * nM + i))
        }
      }
      // within-ensemble edges: chain each directed connected set of the
      // per-trajectory count model (_tram_dataset.py:453)
      for (k <- 0 until nK if k < _dtrajs.length) {
        val model = countTrajectory(Array(_dtrajs(k)), lagtime, countMode,
          maxOrMinus1(_dtrajs(k)) + 1)
        Connectivity.connectedSets(model.counts).foreach { cset =>
          cset.sliding(2).foreach {
            case Array(a, b) => edges += ((a + k * nM, b + k * nM))
            case _ => ()
          }
        }
      }
      // undirected connected components of the (K·M)-node overlap graph;
      // largest by size (tie: smallest node), then unique Markov states
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.toArray
      // Zero-edge degenerate case: the reference's submodel_largest
      // (directed=False) runs over the FULL K·M node set of the sparse
      // overlap matrix, so every node is a singleton component; scipy's
      // connected_components labels node 0 first and the stable
      // size-descending sort keeps it → Markov state 0 survives (never
      // an empty set). Mirror that instead of wiping every sample to -1.
      if (nodes.isEmpty) Array(0)
      else {
        val uf = new UnionFind(nK * nM)
        edges.foreach { case (a, b) => uf.union(a, b) }
        val comps = nodes.groupBy(uf.find).values.toSeq
          .sortBy(c => (-c.length, c.min))
        comps.head.map(_ % nM).distinct.sorted
      }
    case other => throw new IllegalArgumentException(
      s"Connectivity type unsupported: $other. Must be one of " +
        "post_hoc_RE, BAR_variance, summed_count_matrix.")
  }

  /** Restrict the data to the largest connected set under the given
    * connectivity mode: all dtraj samples outside the set become -1 and
    * the count models are recomputed (_tram_dataset.py:309). */
  def restrictToLargestConnectedSet(connectivity: String = "post_hoc_RE",
                                    connectivityFactor: Double = 1.0): this.type = {
    restrictToSubmodel(largestConnectedSet(connectivity, connectivityFactor))
  }

  /** Restrict dtrajs to the given Markov state symbols (-1 elsewhere) and
    * recompute counts (_tram_dataset.py:365 restrict_to_submodel) — over
    * ALL trajectories, not just the first nThermStates. */
  def restrictToSubmodel(states: Array[Int]): this.type = {
    val keep = states.toSet
    _dtrajs = _dtrajs.map(_.map(s => if (keep.contains(s)) s else -1))
    _countModels = computeCounts()
    this
  }

  // --- counting ------------------------------------------------------------

  /** Fragment index mapping per therm state: (traj, start, stop-exclusive)
    * runs of constant ttraj value; a length-1 run is a replica-exchange
    * swap point folded into the FRONT of the following run
    * (trajectory_mapping.h findTrajectoryFragmentIndices). */
  private[markov] def fragmentIndices: Array[Vector[(Int, Int, Int)]] = {
    val ts = ttrajs.get
    val out = Array.fill(nThermStates)(Vector.empty[(Int, Int, Int)])
    for (i <- ts.indices) {
      val t = ts(i)
      val end = t.length
      var first = 0
      while (first < end - 1) {
        var thermState = t(first)
        var last = first
        while (last < end && t(last) == thermState) last += 1
        if (last - first == 1) {
          // swap point: belongs to the next run's therm state
          thermState = t(first + 1)
          last = first + 1
          while (last < end && t(last) == thermState) last += 1
        }
        out(thermState) = out(thermState) :+ ((i, first, last))
        first = last
      }
    }
    out
  }

  /** Per-therm-state dtraj fragments, negatives handled: with ttrajs the
    * fragments are split AT negative samples (no glued transitions);
    * without ttrajs, trajectory k IS ensemble k and negatives are simply
    * filtered (_tram_dataset.py:473,494 — reference behavior, kept). */
  private[markov] def trajectoryFragments: Array[Seq[Array[Int]]] = {
    ttrajs match {
      case None =>
        // an explicit nThermStates larger than the trajectory count leaves
        // the surplus ensembles with no samples (empty count models)
        Array.tabulate(nThermStates)(k =>
          if (k < _dtrajs.length) Seq(_dtrajs(k).filter(_ >= 0)) else Seq.empty)
      case Some(_) =>
        fragmentIndices.map { frags =>
          frags.flatMap { case (traj, start, stop) =>
            splitAtNegatives(_dtrajs(traj).slice(start, stop))
          }
        }
    }
  }

  private def computeCounts(): Array[TramCountModel] = {
    trajectoryFragments.map { frags =>
      if (frags.isEmpty || frags.forall(_.length <= lagtime))
        TramCountModel(DenseMatrix.zeros[Double](nMarkovStates, nMarkovStates),
          new Array[Long](nMarkovStates))
      else countTrajectory(frags.toArray, lagtime, countMode,
        frags.map(maxOrMinus1).max + 1)
    }
  }
}

object TramDataset {

  /** Array-backed union-find over a fixed node range (the K·M overlap
    * graph is model-sized; path-halving + union by min root keeps the
    * largest-component tie-break deterministic). */
  private[markov] final class UnionFind(n: Int) {
    private val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var c = x
      while (parent(c) != c) { parent(c) = parent(parent(c)); c = parent(c) }
      c
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
  }

  private def maxOrMinus1(a: Array[Int]): Int = if (a.isEmpty) -1 else a.max

  /** Split a fragment into maximal runs of non-negative samples
    * (_tram_dataset.py:23 _split_at_negative_state_indices). */
  private[markov] def splitAtNegatives(frag: Array[Int]): Seq[Array[Int]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[Int]
    frag.foreach { s =>
      if (s >= 0) cur += s
      else if (cur.nonEmpty) { out += cur.toArray; cur = scala.collection.mutable.ArrayBuffer.empty[Int] }
    }
    if (cur.nonEmpty) out += cur.toArray
    out.toSeq
  }

  /** Count model over symbols 0..n-1 for a set of fragments: sliding /
    * sliding-effective / sample count modes (TransitionCountEstimator
    * semantics; histogram covers every sample, transitions only pairs
    * inside one fragment). */
  private[markov] def countTrajectory(frags: Array[Array[Int]], tau: Int,
                                      mode: String, n: Int): TramCountModel = {
    val counts = DenseMatrix.zeros[Double](math.max(n, 0), math.max(n, 0))
    val hist = new Array[Long](math.max(n, 0))
    frags.foreach { arr =>
      arr.foreach(s => if (s >= 0) hist(s) += 1)
      mode match {
        case "sliding" | "sliding-effective" =>
          var i = 0
          while (i + tau < arr.length) {
            val a = arr(i); val b = arr(i + tau)
            if (a >= 0 && b >= 0) counts(a, b) += 1.0
            i += 1
          }
        case "sample" =>
          var i = 0
          while (i + tau < arr.length) {
            val a = arr(i); val b = arr(i + tau)
            if (a >= 0 && b >= 0) counts(a, b) += 1.0
            i += tau
          }
        case other => throw new IllegalArgumentException(
          s"count mode $other not supported (sliding, sliding-effective, sample)")
      }
    }
    if (mode == "sliding-effective") {
      val scaled = counts / tau.toDouble
      TramCountModel(scaled, hist)
    } else TramCountModel(counts, hist)
  }

  /** Largest directed SCC where edges require count >= threshold
    * (compute_connected_sets connectivity_threshold semantics,
    * _util.py:168). */
  private[markov] def largestSccThreshold(counts: DenseMatrix[Double],
                                          threshold: Double): Array[Int] = {
    val c = counts.copy
    if (threshold > 0) {
      for (i <- 0 until c.rows; j <- 0 until c.cols)
        if (c(i, j) < threshold) c(i, j) = 0.0
    }
    Connectivity.largestConnectedSet(c)
  }

  /** post_hoc_RE overlap (connected_set.h OverlapPostHocReplicaExchange):
    * pairs are (bias at k, bias at l) for samples binned in one Markov
    * state, sampled at k (atK) and at l (atL). */
  private[markov] def postHocOverlapTest(atK: Array[(Double, Double)],
                                         atL: Array[(Double, Double)],
                                         factor: Double): Boolean = {
    val n = atK.length.toLong
    val m = atL.length.toLong
    var nSum = 0.0
    atK.foreach { case (ak, al) =>
      atL.foreach { case (bk, bl) =>
        val delta = ak + bl - al - bk
        nSum += math.min(math.exp(delta), 1.0)
      }
    }
    val nAvg = nSum / (n * m).toDouble
    (n + m) * nAvg * factor >= 1.0
  }

  /** BAR-variance overlap (connected_set.h OverlapBarVariance). The
    * log(n/m) term uses INTEGER division exactly like the reference's
    * `std::log(1.0 * static_cast<dtype>(n / m))` — for n < m this is
    * log(0) = -inf and the state pair never overlaps; reproduced
    * deliberately for fixture parity. */
  private[markov] def barVarianceOverlapTest(atK: Array[(Double, Double)],
                                             atL: Array[(Double, Double)],
                                             factor: Double): Boolean = {
    val n = atK.length
    val m = atL.length
    val dbIJ = atK.map { case (ak, al) => al - ak }
    val dbJI = atL.map { case (bk, bl) => bk - bl }
    val du = dbIJ ++ dbJI.map(-_)
    def logMeanExpMin0(xs: Array[Double]): Double = {
      // logsumexp over min(0, x): max element is <= 0 so shift by 0
      val s = xs.map(x => math.exp(math.min(0.0, x))).sum
      math.log(s)
    }
    val df = logMeanExpMin0(dbJI) - logMeanExpMin0(dbIJ)
    val logRatio = math.log((n / m).toDouble) // integer division, see scaladoc
    val b = du.map(y => 1.0 / (2.0 + 2.0 * math.cosh(df - y - logRatio))).sum
    (1.0 / b - (n + m).toDouble / (n.toLong * m).toDouble) < factor
  }

  /** Distributed post_hoc_RE overlap statistic: from a sample frame
    * (markov_state int, therm int, bias array<double> of length K),
    * computes per (markov_state, k, l) the pair count and the pairwise
    * overlap sum n_sum = Σ min(e^Δ, 1) — one self-join keyed on the
    * Markov state (bias payloads are small fixed-K arrays; the join fans
    * out only within a state). The per-cell sample counts are appended
    * as `n_k`/`m_l` (broadcast-joined from the same capped frame), so
    * the caller can evaluate the acceptance GATE
    * (n_k+m_l)·n_avg·factor ≥ 1 directly; q245 does exactly that.
    *
    * The kernel is quadratic WITHIN a (markov_state, k, l) cell pair by
    * the reference's own semantics (connected_set.h computes every
    * cross-ensemble bias-difference pair). `maxSamplesPerCell` is the
    * reference-semantic-preserving bound on that fan-out at scale: keep
    * at most N samples per (markov_state, therm) cell, chosen
    * deterministically by `orderCols` (required when the cap is set —
    * a nondeterministic cap would make the statistic run-dependent).
    * The overlap estimate n_sum / n_pairs is a mean over pairs, so a
    * deterministic per-cell subsample estimates the same quantity with
    * bounded cost; Int.MaxValue (default) disables the cap. */
  def postHocOverlap(samples: org.apache.spark.sql.DataFrame,
                     maxSamplesPerCell: Int = Int.MaxValue,
                     orderCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
import graft.util.Materialize.FrozenOps
    // localCheckpoint on BOTH branches: the (capped) frame feeds both
    // self-join legs AND the cell-count aggregate — unmaterialized, the
    // upstream pipeline (plus the per-cell window when capping) would
    // execute three times per call
    val capped =
      if (maxSamplesPerCell == Int.MaxValue) samples.frozen()
      else {
        require(orderCols.nonEmpty,
          "maxSamplesPerCell needs orderCols for a deterministic cap")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("markov_state", "therm")
          .orderBy(orderCols.map(col): _*)
        samples.withColumn("graft_cell_rn", row_number().over(w))
          .where(col("graft_cell_rn") <= maxSamplesPerCell)
          .drop("graft_cell_rn")
          .frozen()
      }
    val a = capped.select(col("markov_state"), col("therm").as("k"),
      col("bias").as("bias_a"))
    val b = capped.select(col("markov_state"), col("therm").as("l"),
      col("bias").as("bias_b"))
    val cells = capped.groupBy(col("markov_state"), col("therm"))
      .agg(count(lit(1)).as("c"))
    a.join(b, Seq("markov_state")).where(col("k") =!= col("l"))
      .select(col("markov_state"), col("k"), col("l"),
        least(exp(element_at(col("bias_a"), col("k") + 1)
            + element_at(col("bias_b"), col("l") + 1)
            - element_at(col("bias_a"), col("l") + 1)
            - element_at(col("bias_b"), col("k") + 1)), lit(1.0)).as("term"))
      .groupBy(col("markov_state"), col("k"), col("l"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("term")).as("n_sum"))
      .join(broadcast(cells.select(col("markov_state"),
        col("therm").as("k"), col("c").as("n_k"))), Seq("markov_state", "k"))
      .join(broadcast(cells.select(col("markov_state"),
        col("therm").as("l"), col("c").as("m_l"))), Seq("markov_state", "l"))
      .select(col("markov_state"), col("k"), col("l"), col("n_pairs"),
        round(col("n_sum"), 6).as("n_sum"),
        round(col("n_sum") / col("n_pairs"), 6).as("n_avg"),
        col("n_k"), col("m_l"))
  }
}
