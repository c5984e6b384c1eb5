package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Trajectories
import graft.lag.Lag
import graft.agg.Covariance
import graft.linalg.LinAlg
import graft.markov.TransitionCounting
import graft.text.{Bpe, Packing, Pii, Scoring, TextFunctions}
import graft.dedup.Dedup
import graft.operators.Joins
import graft.similarity.Similarity
import graft.queries.QShared._

/** DecompositionQueries: TICA/VAMP/EDMD projections and scores, k-means family, regular-space clustering, SINDy normal equations.
  *
  * One slice of the driver-contract registry (VERDICT r06 item 8 split
  * of the 5,000-line SparkEntry monolith). Entry bodies are UNCHANGED;
  * graft.SparkEntry merges every family into the single `queries` /
  * `oracleSql` maps the driver consumes, and ContractSpec keeps the
  * key sets equal. */
private[graft] object DecompositionQueries extends QueryFamily {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ---- decomposition / model pipelines ------------------------------
    // TICA end to end, hash-gated by its sample identities: with r the
    // C00sym-orthonormal eigenvectors fit on THIS data, the projected
    // pairs' symmetrized covariances satisfy r'C00sym r = I and
    // r'C0tsym r = diag(lambda) exactly (projection is affine, these are
    // sample identities, FP residual ~1e-12). The check transforms ALL
    // rows and re-runs the covariance aggregate on the projections, so
    // scan -> lag window -> covariance -> driver eig -> broadcast
    // projection -> covariance is verified end to end, not rows-only.
    "q29_tica_projection" -> ((s, dir) => {
      // session-memoized lag-pair frame (liPairs): materialized once,
      // shared with q30/q63/q73 — fit + the projected re-covariance both
      // read the checkpointed blocks instead of re-running scan+window
      val pairs = liPairs(s, dir)
      val cov = Covariance.fit(pairs)
      val m = graft.decomposition.Tica.fitFromCovariance(cov, 1, dim = 2)
      val proj = pairs.select(col("traj_id"), col("t"),
        m.projection(col("x")).as("x"), m.projection(col("y")).as("y"))
      val pcov = Covariance.fit(proj.select(col("x"), col("y")))
      val (pc0, pct, _) = graft.decomposition.Tica.symmetrized(pcov)
      val k = m.k
      import s.implicits._
      (for (i <- 0 until k; j <- 0 until k) yield
        (i, j, r6(pc0(i, j) - (if (i == j) 1.0 else 0.0)) + 0.0,
          r6(pct(i, j) - (if (i == j) m.singularValues(i) else 0.0)) + 0.0))
        .toDF("ic_i", "ic_j", "c00_resid", "c0t_resid")
    }),

    // VAMP whitening/SVD identities per component pair: U'C00 U = I,
    // V'Ctt V = I, U'C0t V = diag(sigma) — exact sample identities of the
    // whitened SVD, so a broken spd_inv_split / SVD / covariance path
    // flips the hash.
    "q30_vamp_singular" -> ((s, dir) => {
      import breeze.linalg.DenseMatrix
      val cov = Covariance.fit(liPairs(s, dir))
      val m = graft.decomposition.Vamp.fitFromCovariance(cov, 1)
      val d = cov.d; val k = m.k
      val c00 = LinAlg.fromFlat(cov.cov00, d)
      val ctt = LinAlg.fromFlat(cov.covtt, d)
      val c0t = LinAlg.fromFlat(cov.cov0t, d)
      val u = DenseMatrix.tabulate(d, k)((i, j) => m.u(i * k + j))
      val v = DenseMatrix.tabulate(d, k)((i, j) => m.vOpt.get(i * k + j))
      val w00 = u.t * c00 * u
      val wtt = v.t * ctt * v
      val cross = u.t * c0t * v
      import s.implicits._
      (for (i <- 0 until k; j <- 0 until k) yield
        (i, j, r6(w00(i, j) - (if (i == j) 1.0 else 0.0)) + 0.0,
          r6(wtt(i, j) - (if (i == j) 1.0 else 0.0)) + 0.0,
          r6(cross(i, j) - (if (i == j) m.singularValues(i) else 0.0)) + 0.0))
        .toDF("comp_i", "comp_j", "u_c00_u_resid", "v_ctt_v_resid", "u_c0t_v_resid")
    }),

    // Lloyd k-means run to the exact fixed point: at convergence each
    // center equals the mean of its assigned points, and every row's
    // own-center distance equals its minimum center distance — both checked
    // over the FULL data with our codegen argmin assignment. The fit is the
    // distinct-value-histogram exact Lloyd (fit1dExact): one aggregation
    // scan replaces the r04 shape's ~200 sequential MLlib jobs (the 2.31x
    // bench-cap violation), and because every row equals its value the
    // histogram fixed point IS the full-data fixed point — the oracle
    // contract is unchanged and tighter. The row count has an exact SQL
    // twin.
    "q32_kmeans_assign" -> ((s, dir) => {
      val traj = Trajectories.fromEvents(s, dir)
      val model = graft.clustering.KMeans.fit1dExact(traj, k = 5, seed = 42L)
      val assigned = model.transform(traj).cache()
      try {
        val centers = model.centers.map(_(0))
        // per-row argmin violation: |x - c_state| - min_j |x - c_j| == 0
        val x = col(Trajectories.FeatCol).getItem(0)
        val ownDist = abs(x - element_at(typedLit(centers.toSeq), col("state") + 1))
        val minDist = least(centers.map(c => abs(x - lit(c))): _*)
        val aggRow = assigned.agg(
          max(ownDist - minDist).as("argmin_viol"),
          count(lit(1)).as("n")).collect()(0)
        // fixed point: center_s == mean of assigned values
        val meansMap = assigned.groupBy("state").agg(avg(x).as("m")).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val fixedPoint = centers.indices.map(i =>
          math.abs(centers(i) - meansMap.getOrElse(i, centers(i)))).max
        checksDf(s, Seq(
          "assign_argmin" -> aggRow.getDouble(0),
          "centroid_fixed_point" -> fixedPoint,
          "k_centers_minus_5" -> (model.k - 5).toDouble,
          "n_assigned" -> aggRow.getLong(1).toDouble))
      } finally { assigned.unpersist(); () }
    }),

    // EDMD hash-gated by its defining identities: the operator solves the
    // (uncentered) normal equations C00 M = C0t, and every eigenpair
    // satisfies M v = lambda v (complex pairs checked in real arithmetic
    // over the LAPACK-encoded columns). Both residuals are driver-exact
    // zeros; the data side (basis lift + covariance) feeds them.
    "q49_edmd_eigs" -> ((s, dir) => {
      import breeze.linalg.DenseMatrix
      val traj = liTraj(s, dir)
      val basis = graft.basis.Monomials(1)
      // one lift+aggregate scan: the normal-equation residual checks the
      // pinv solve against the covariance the fit actually consumed (the
      // r04 shape re-scanned the data to rebuild the same moments — same
      // code path, so no extra independence, 2x the data cost)
      val (m, cov) = graft.decomposition.Edmd.fitWithCov(traj, basis, tau = 1,
        inputDim = 4, pairsOpt = Some(liPairs(s, dir)))
      val p = m.p
      def raw(c: Array[Double], ma: Array[Double], mb: Array[Double]) =
        DenseMatrix.tabulate(p, p)((i, j) => c(i * p + j) + ma(i) * mb(j))
      val c00 = raw(cov.cov00, cov.mean0, cov.mean0)
      val c0t = raw(cov.cov0t, cov.mean0, cov.meant)
      val op = DenseMatrix.tabulate(p, p)((i, j) => m.operator(i * p + j))
      val neRes = breeze.linalg.max(breeze.numerics.abs(c00 * op - c0t))
      val vecs = DenseMatrix.tabulate(p, p)((i, j) => m.modes(i * p + j))
      // per-component eigen residual ||M v - lambda v||_inf, complex pairs
      // via their (re, im) column encoding (+im column first after the
      // stable magnitude sort)
      def eigRes(c: Int): Double = {
        val re = m.eigenvaluesRe(c); val im = m.eigenvaluesIm(c)
        if (im == 0.0) {
          val v = vecs(::, c)
          breeze.linalg.max(breeze.numerics.abs(op * v - v * re))
        } else {
          // evaluate the canonical +im member of the conjugate pair (its
          // partner's residual has identical magnitude)
          val cf = if (im > 0) c else c - 1
          val reF = m.eigenvaluesRe(cf); val imF = m.eigenvaluesIm(cf)
          val vr = vecs(::, cf); val vi = vecs(::, cf + 1)
          val rr = op * vr - (vr * reF - vi * imF)
          val ri = op * vi - (vi * reF + vr * imF)
          math.max(breeze.linalg.max(breeze.numerics.abs(rr)),
            breeze.linalg.max(breeze.numerics.abs(ri)))
        }
      }
      import s.implicits._
      (0 until p).map(c => (c, r6(eigRes(c)) + 0.0, r6(neRes) + 0.0))
        .toDF("component", "eig_resid", "normal_eq_resid")
    }),

    // ---- clustering extensions ----------------------------------------
    // Regular-space invariants: kept centers are pairwise >= dmin apart
    // (exact by the leader-merge rule) and every data point lies within
    // 2*dmin of some center (the two-level partition-then-merge pass
    // guarantees 2*dmin, not the sequential dmin: a partition-local leader
    // can be merged away into a center < dmin from it). The coverage check
    // scans the FULL data with the broadcast centers.
    "q50_regspace" -> ((s, dir) => {
      val traj = Trajectories.fromEvents(s, dir)
      val dmin = 30.0
      val model = graft.clustering.RegularSpace.fit(traj, dmin = dmin, maxCenters = 50)
      val centers = model.centers.map(_(0))
      // a single center has no pair distances; the constraint is vacuously met
      val minPair = (for (i <- centers.indices; j <- i + 1 until centers.length)
        yield math.abs(centers(i) - centers(j))).minOption.getOrElse(dmin)
      val x = col(Trajectories.FeatCol).getItem(0)
      val minDist = least(centers.map(c => abs(x - lit(c))): _*)
      val maxMin = traj.agg(max(minDist)).collect()(0).getDouble(0)
      checksDf(s, Seq(
        "pairwise_ge_dmin" -> math.max(0.0, dmin - minPair),
        "coverage_within_2dmin" -> math.max(0.0, maxMin - 2.0 * dmin),
        "n_centers_gt_max" -> math.max(0.0, (centers.length - 50).toDouble)))
    }),

    // Mini-batch k-means invariants: k centers, finite, and the final
    // full-data assignment is the exact argmin of the learned centers
    // (cross-checks the epoch loop's output against the codegen argmin).
    "q51_minibatch_kmeans" -> ((s, dir) => {
      val traj = Trajectories.fromEvents(s, dir)
      val model = graft.clustering.MiniBatchKMeans.fit(traj, k = 4,
        batchFraction = 0.2, maxEpochs = 3, seed = 42L)
      val centers = model.centers.map(_(0))
      val assigned = model.transform(traj)
      val x = col(Trajectories.FeatCol).getItem(0)
      val ownDist = abs(x - element_at(typedLit(centers.toSeq), col("state") + 1))
      val minDist = least(centers.map(c => abs(x - lit(c))): _*)
      val row = assigned.agg(max(ownDist - minDist).as("v"),
        count(lit(1)).as("n")).collect()(0)
      checksDf(s, Seq(
        "assign_argmin" -> row.getDouble(0),
        "k_centers_minus_4" -> (model.k - 4).toDouble,
        "centers_nonfinite" -> (if (centers.forall(c => !c.isNaN && !c.isInfinite)) 0.0 else 1.0),
        "n_assigned" -> row.getLong(1).toDouble))
    }),

    // ---- forced-distributed minibatch transport (q266): the r15 size
    // dispatch routes q51 through the driver-LOCAL batch chain at bench
    // SFs, which would leave the distributed per-batch reduce — the
    // 100 TB transport — without a DuckDB gate (the exact gap q265
    // closed for BayesianHmm). This query forces localThreshold = 0 so
    // the DISTRIBUTED chain executes under the oracle, and pins the two
    // transports against each other: identical seeded init, identical
    // hash-drawn batch membership (`inBatch` is a pure content hash),
    // so centers differ only in float summation order of batch means
    // (~1e-15 relative; clamped below 1e-7, the q265 discipline —
    // the raw residual stays visible un-gated on stdout). tolerance = 0
    // on purpose (ADVICE r15): a convergence exit keyed on the float-
    // merge-order-sensitive batch cost could fire on different epochs
    // per transport near the threshold, and the extra-epoch residual
    // (~tolerance-sized, not float-noise-sized) would blow the clamp —
    // both runs execute the full fixed maxEpochs x batchesPerEpoch
    // schedule so only summation order can differ. --------------------
    "q266_minibatch_dist_transport" -> ((s, dir) => {
      val traj = Trajectories.fromEvents(s, dir)
      // ONE shared seed for both transports: the parity contract requires
      // identical inits, which the old shape achieved by running the same
      // MLlib seeding fit twice — computing it once makes the identity
      // hold by construction and halves the setup jobs
      val init = graft.clustering.KMeans.fit(
        traj.select(col(Trajectories.FeatCol).cast("array<double>")
            .as(Trajectories.FeatCol))
          .sample(withReplacement = false, 0.2, 42L),
        k = 4, maxIter = 5, seed = 42L).centers
      def run(th: Long) = graft.clustering.MiniBatchKMeans.fit(traj, k = 4,
        batchFraction = 0.2, maxEpochs = 3, tolerance = 0.0, seed = 42L,
        localThreshold = th, init = Some(init))
      val loc = run(Long.MaxValue)
      val dist = run(0L)
      val parityRaw = loc.centers.zip(dist.centers).flatMap { case (ca, cb) =>
        ca.zip(cb).map { case (a, b) => math.abs(a - b) } }.max
      println(f"[q266] minibatch_transport_parity raw residual = $parityRaw%.3e")
      val parity = if (parityRaw < 1e-7) 0.0 else parityRaw
      val nonfinite = dist.centers.iterator.flatMap(_.iterator)
        .count(v => v.isNaN || v.isInfinite).toDouble
      checksDf(s, Seq(
        "transport_parity" -> parity,
        "k_centers_minus_4" -> (dist.k - 4).toDouble,
        "centers_nonfinite" -> nonfinite))
    }),

    // ---- forced-distributed Lloyd transport (q267): LloydKMeans gained
    // the same size dispatch as MiniBatchKMeans in r15, so q84's capped
    // sample runs the driver-LOCAL loop at test SFs — this query forces
    // localThreshold = 0 so the distributed per-iteration reduce (the
    // full-corpus 100 TB shape) executes under the oracle, pinned
    // against the local transport (identical seeding and per-row body;
    // centers differ only in float summation order, clamped below 1e-7
    // per the q265/q266 rule, raw residual printed un-gated). Manhattan
    // metric on purpose: the metric-pluggable leg is the one the
    // reference's registry exercises. ---------------------------------
    "q267_lloyd_dist_transport" -> ((s, dir) => {
      import graft.clustering.{LloydKMeans, ManhattanMetric}
      val traj = liTraj(s, dir)
      // tol = 0 (ADVICE r15): `moved` is float-merge-order-sensitive, so
      // a positive tol could converge on different iterations per
      // transport and leak a tol-sized (not noise-sized) residual into
      // the clamp; at 0 both runs execute the full 8 iterations (an
      // exact-zero `moved` exit means a fixed point — extra iterations
      // are no-ops within float noise either way)
      // ONE shared k-means++ seed for both transports (the q266 note:
      // identical inits by construction instead of by re-derivation)
      val init = graft.clustering.KMeansPlusPlus.seed(
        traj.select(col(Trajectories.FeatCol).cast("array<double>")
          .as(Trajectories.FeatCol)), k = 4, seedVal = 42L)
      def run(th: Long) = LloydKMeans.fit(traj, k = 4, metric = ManhattanMetric,
        maxIter = 8, tol = 0.0, seed = 42L, localThreshold = th,
        init = Some(init))
      val loc = run(Long.MaxValue)
      val dist = run(0L)
      val parityRaw = loc.centers.zip(dist.centers).flatMap { case (ca, cb) =>
        ca.zip(cb).map { case (a, b) => math.abs(a - b) } }.max
      println(f"[q267] lloyd_transport_parity raw residual = $parityRaw%.3e")
      val parity = if (parityRaw < 1e-7) 0.0 else parityRaw
      val nonfinite = dist.centers.iterator.flatMap(_.iterator)
        .count(v => v.isNaN || v.isInfinite).toDouble
      checksDf(s, Seq(
        "transport_parity" -> parity,
        "k_centers_minus_4" -> (dist.k - 4).toDouble,
        "centers_nonfinite" -> nonfinite))
    }),

    // ---- VAMP cross-validated scores ----------------------------------
    // Per-split invariants: VAMP2 CV scores are bounded by the score of
    // the constant singular function alone (>= 1) and by 1 + d from above
    // on the train side; the held-out score additionally stays finite.
    // The split draw is a seeded hash so the run is deterministic, but the
    // score VALUES are eig-path-only — the oracle checks the bounds grid.
    "q62_vamp_cv" -> ((s, dir) => {
      val traj = liTraj(s, dir)
      val scores = graft.decomposition.Scoring.vampScoreCv(traj, tau = 1, n = 3, seed = 42L)
      import s.implicits._
      scores.zipWithIndex.map { case (sc, i) =>
        val finite = if (sc.isNaN || sc.isInfinite) 1.0 else 0.0
        // held-out VAMP2 of a d=4 model: >= 1 (constant function) and
        // far below the generous 2*(1+d) sanity ceiling
        (i, r6(math.max(0.0, 1.0 - sc)) + 0.0,
          r6(math.max(0.0, sc - 10.0)) + 0.0, finite)
      }.toDF("split", "lower_bound_viol", "upper_bound_viol", "nonfinite")
    }),

    // Custom-metric (Manhattan) distributed Lloyd k-means over the 4-d
    // lineitem features (reference _kmeans.py:148-473 + metric.h registry:
    // any registered metric drives assignment; centers update by mean).
    // q51-style contract battery: the metric-aware codegen argmin
    // (struct-sort) is cross-checked against an independently-built
    // least(...) expression over the full data, centers are finite and k
    // as requested; the assigned-row count has an exact SQL twin.
    "q84_custom_kmeans" -> ((s, dir) => {
      import graft.clustering.{LloydKMeans, ManhattanMetric}
      val traj = liTraj(s, dir)
      val model = LloydKMeans.fit(traj, k = 4, metric = ManhattanMetric,
        maxIter = 8, tol = 1e-4, seed = 42L)
      val assigned = model.transformMetric(traj, ManhattanMetric).cache()
      try {
        val feat = col(Trajectories.FeatCol)
        val dists = model.centers.map(c => ManhattanMetric.distColumn(feat, c))
        val ownDist = element_at(array(dists: _*), col("state") + 1)
        val minDist = least(dists: _*)
        val aggRow = assigned.agg(
          max(ownDist - minDist).as("argmin_viol"),
          count(lit(1)).as("n")).collect()(0)
        val nonfinite = model.centers.flatten
          .count(v => v.isNaN || v.isInfinite).toDouble
        checksDf(s, Seq(
          "assign_argmin" -> aggRow.getDouble(0),
          "k_centers_minus_4" -> (model.k - 4).toDouble,
          "centers_nonfinite" -> nonfinite,
          "n_assigned" -> aggRow.getLong(1).toDouble))
      } finally { assigned.unpersist(); () }
    }),

    // ---- k-means++ seeding contract (q143): the standalone D^2
    // initializer returns exactly k pairwise-distinct centers, each one
    // an actual input point (min squared distance to the data is an
    // exact zero — same doubles, no recomputation slack). --------------
    "q143_kmeanspp_init" -> ((s, dir) => {
      val traj = liTraj(s, dir)
      val centers = graft.clustering.KMeansPlusPlus.seed(traj, k = 6, seedVal = 42L)
      val feat = col(Trajectories.FeatCol)
      def d2(c: Array[Double]) = {
        val terms = c.indices.map(i =>
          (feat.getItem(i) - lit(c(i))) * (feat.getItem(i) - lit(c(i))))
        terms.reduce(_ + _)
      }
      val minDists = traj.agg(
        min(d2(centers(0))), min(d2(centers(1))), min(d2(centers(2))),
        min(d2(centers(3))), min(d2(centers(4))), min(d2(centers(5))))
        .collect()(0)
      val memberResid = (0 until 6).map(minDists.getDouble).max
      def dist(a: Array[Double], b: Array[Double]) =
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      val minPair = (for (i <- 0 until 6; j <- i + 1 until 6) yield
        dist(centers(i), centers(j))).min
      checksDf(s, Seq(
        "n_centers" -> centers.length.toDouble,
        "centers_are_data_points" -> memberResid,
        "centers_pairwise_distinct" -> (if (minPair > 0.0) 0.0 else 1.0)))
    }),

    // ---- Kernel CCA (q146): canonical correlations of the Gaussian-
    // kernel embedding over the landmark subset. Gates: k eigenvalues
    // returned, each inside [0, 1] up to the epsilon regularization,
    // magnitude-sorted decreasing, and the eigenfunction evaluation has
    // the requested dimension. ------------------------------------------
    "q146_kernel_cca" -> ((s, dir) => {
      val m = graft.decomposition.KernelCca.fit(liTraj(s, dir),
        graft.kernels.GaussianKernel(1.0), tau = 1, nEigs = 5,
        maxLandmarks = 200, seed = 42L, pairsOpt = Some(liPairs(s, dir)))
      val ev = m.eigenvalues
      val inUnit = ev.map(v => math.max(0.0, math.max(-v, v - 1.0 - 1e-3))).max
      val sorted = if (ev.zip(ev.tail).forall { case (a, b) =>
        math.abs(a) >= math.abs(b) - 1e-12 }) 0.0 else 1.0
      val probe = m.transformPoint(Array(0.5, 0.5, 0.05, 0.05))
      checksDf(s, Seq(
        "n_eigs" -> ev.length.toDouble,
        "eig_in_unit_interval" -> inUnit,
        "eig_sorted_by_magnitude" -> sorted,
        "transform_dim" -> probe.length.toDouble,
        "transform_finite" -> (if (probe.forall(v =>
          !v.isNaN && !v.isInfinite)) 0.0 else 1.0)))
    }),

    // ---- KVAD (q147): kernel-embedding variational score over the
    // monomial observable. Gates: nonnegative magnitude-sorted singular
    // values, finite score, and the Koopman matrix has the lifted
    // observable dimension. ---------------------------------------------
    "q147_kvad" -> ((s, dir) => {
      val basis = graft.basis.Monomials(1)
      val m = graft.decomposition.Kvad.fit(liTraj(s, dir),
        graft.kernels.GaussianKernel(1.0), tau = 1, chi = basis,
        inputDim = 4, maxLandmarks = 200, seed = 42L,
        pairsOpt = Some(liPairs(s, dir)))
      val sv = m.singularValues
      val nonneg = sv.map(v => math.max(0.0, -v)).max
      val sorted = if (sv.zip(sv.tail).forall { case (a, b) => a >= b - 1e-12 })
        0.0 else 1.0
      checksDf(s, Seq(
        "n_singular_values" -> sv.length.toDouble,
        "sv_nonnegative" -> nonneg,
        "sv_sorted_desc" -> sorted,
        "score_finite" -> (if (!m.score.isNaN && !m.score.isInfinite) 0.0 else 1.0),
        "koopman_rows" -> m.koopmanMatrix.rows.toDouble))
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

    // TICA sample-identity grid: projected symmetrized covariances must be
    // exactly I / diag(lambda) (see the query comment).
    "q29_tica_projection" -> {
      val rows = (for (i <- 0 until 2; j <- 0 until 2) yield s"($i, $j, 0.0, 0.0)").mkString(", ")
      s"""SELECT * FROM (VALUES $rows) AS t(ic_i, ic_j, c00_resid, c0t_resid)"""
    },

    // VAMP whitening/SVD identity grid (d=4 full-rank lineitem features).
    "q30_vamp_singular" -> {
      val rows = (for (i <- 0 until 4; j <- 0 until 4) yield s"($i, $j, 0.0, 0.0, 0.0)").mkString(", ")
      s"""SELECT * FROM (VALUES $rows)
          AS t(comp_i, comp_j, u_c00_u_resid, v_ctt_v_resid, u_c0t_v_resid)"""
    },

    // EDMD normal-equation + eigenpair residual grid (p = 1 + 4 monomial
    // basis functions).
    "q49_edmd_eigs" -> {
      val rows = (0 until 5).map(c => s"($c, 0.0, 0.0)").mkString(", ")
      s"""SELECT * FROM (VALUES $rows) AS t(component, eig_resid, normal_eq_resid)"""
    },

    // VAMP CV bounds grid (3 deterministic seeded splits).
    "q62_vamp_cv" -> {
      val rows = (0 until 3).map(c => s"($c, 0.0, 0.0, 0.0)").mkString(", ")
      s"""SELECT * FROM (VALUES $rows)
          AS t(split, lower_bound_viol, upper_bound_viol, nonfinite)"""
    },

    // Lloyd fixed-point battery; the assigned-row count is exact SQL.
    "q32_kmeans_assign" ->
      """SELECT 'assign_argmin' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'centroid_fixed_point', 0.0
         UNION ALL SELECT 'k_centers_minus_5', 0.0
         UNION ALL SELECT 'n_assigned', (SELECT CAST(count(*) AS DOUBLE) FROM events)""",

    "q50_regspace" ->
      """SELECT * FROM (VALUES
           ('pairwise_ge_dmin', 0.0), ('coverage_within_2dmin', 0.0),
           ('n_centers_gt_max', 0.0)) AS t("check", "value")""",

    "q51_minibatch_kmeans" ->
      """SELECT 'assign_argmin' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'k_centers_minus_4', 0.0
         UNION ALL SELECT 'centers_nonfinite', 0.0
         UNION ALL SELECT 'n_assigned', (SELECT CAST(count(*) AS DOUBLE) FROM events)""",

    // Forced-distributed minibatch transport twin: parity (sub-clamp)
    // and validity rows are exact zeros.
    "q266_minibatch_dist_transport" ->
      """SELECT * FROM (VALUES
           ('transport_parity', 0.0), ('k_centers_minus_4', 0.0),
           ('centers_nonfinite', 0.0)) AS t("check", "value")""",

    // Forced-distributed Lloyd transport twin: parity (sub-clamp) and
    // validity rows are exact zeros.
    "q267_lloyd_dist_transport" ->
      """SELECT * FROM (VALUES
           ('transport_parity', 0.0), ('k_centers_minus_4', 0.0),
           ('centers_nonfinite', 0.0)) AS t("check", "value")""",

    // Custom-metric Lloyd battery; the assigned-row count is exact SQL.
    "q84_custom_kmeans" ->
      """SELECT 'assign_argmin' AS "check", 0.0 AS "value"
         UNION ALL SELECT 'k_centers_minus_4', 0.0
         UNION ALL SELECT 'centers_nonfinite', 0.0
         UNION ALL SELECT 'n_assigned', (SELECT CAST(count(*) AS DOUBLE) FROM lineitem)""",

    // k-means++ twin: exact contract anchors.
    "q143_kmeanspp_init" ->
      """SELECT 'n_centers' AS "check", 6.0 AS "value"
         UNION ALL SELECT 'centers_are_data_points', 0.0
         UNION ALL SELECT 'centers_pairwise_distinct', 0.0""",

    // Kernel-CCA twin: contract anchors.
    "q146_kernel_cca" ->
      """SELECT 'n_eigs' AS "check", 5.0 AS "value"
         UNION ALL SELECT 'eig_in_unit_interval', 0.0
         UNION ALL SELECT 'eig_sorted_by_magnitude', 0.0
         UNION ALL SELECT 'transform_dim', 5.0
         UNION ALL SELECT 'transform_finite', 0.0""",

    // KVAD twin: contract anchors. Monomials(1) over 4 dims lifts to 5
    // coordinates, but the constant coordinate centers to zero and the
    // whitening truncates it — 4 singular directions survive, and the
    // Koopman matrix re-adds the constant row (4 + 1 = 5).
    "q147_kvad" ->
      """SELECT 'n_singular_values' AS "check", 4.0 AS "value"
         UNION ALL SELECT 'sv_nonnegative', 0.0
         UNION ALL SELECT 'sv_sorted_desc', 0.0
         UNION ALL SELECT 'score_finite', 0.0
         UNION ALL SELECT 'koopman_rows', 5.0""",
  )
}
