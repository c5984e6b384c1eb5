package graft.sindy

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.basis.{Monomials, Observable}
import graft.core.Trajectories.{TrajCol, TimeCol, FeatCol}

/** SINDy — sparse identification of nonlinear dynamics (reference
  * sindy/_sindy.py:240 `SINDy`, :366 `STLSQ`; Brunton et al. 2016).
  *
  * Spark-first shape: the data-sized work is ONE pass — the candidate
  * library Theta(X) is a codegen column expression (Monomials), the
  * derivative targets come from a per-trajectory window, and a single
  * Aggregator reduces everything to the normal-equation blocks
  * A = Theta^T Theta (p x p) and B = Theta^T Xdot (p x d). The STLSQ
  * thresholding loop then runs on the driver over those tiny matrices —
  * re-solving per iteration costs O(p^3), never another data scan. */
object Sindy {

  case class SindyModel(
      /** coefficients Xi, (nTargets x p) row-major: xdot_i = sum_k Xi(i,k) theta_k */
      coefficients: Array[Double], p: Int, d: Int,
      library: Observable, inputDim: Int,
      /** feature names of the library functions */
      featureNames: Seq[String]) {

    def coef(target: Int, feature: Int): Double = coefficients(target * p + feature)

    /** Predicted derivative column for a features array (model apply). */
    def predictColumn(feat: Column): Column = {
      val theta = library(feat, inputDim)
      val comps = (0 until d).map { i =>
        (0 until p).map { k =>
          theta.getItem(k) * lit(coef(i, k))
        }.reduce(_ + _)
      }
      array(comps: _*)
    }

    /** Equations as strings for inspection. */
    def equations(precision: Int = 3): Seq[String] =
      (0 until d).map { i =>
        val terms = (0 until p).filter(k => math.abs(coef(i, k)) > 1e-14)
          .map(k => s"${("%." + precision + "f").format(coef(i, k))} ${featureNames(k)}")
        s"x${i}' = " + (if (terms.isEmpty) "0" else terms.mkString(" + "))
      }
  }

  /** Per-trajectory central-difference derivative of every feature dim
    * (np.gradient semantics: one-sided at the ends, central inside). */
  def gradientFrame(traj: DataFrame, dim: Int, dt: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(TrajCol).orderBy(TimeCol)
    val prev = lag(col(FeatCol), 1).over(w)
    val next = lead(col(FeatCol), 1).over(w)
    val comps = (0 until dim).map { i =>
      val x = col(FeatCol).getItem(i)
      val xp = prev.getItem(i)
      val xn = next.getItem(i)
      when(prev.isNull && next.isNull, lit(null))
        .when(prev.isNull, (xn - x) / dt)
        .when(next.isNull, (x - xp) / dt)
        .otherwise((xn - xp) / (2.0 * dt))
    }
    traj.withColumn("xdot", array(comps: _*))
  }

  /** One-pass normal equations: returns (A = Th'Th, B = Th'Y, count). */
  def normalEquations(df: DataFrame, thetaCol: String, yCol: String): (DenseMatrix[Double], DenseMatrix[Double], Long) = {
    val cov = graft.agg.Covariance.fit(
      df.select(col(thetaCol).as("x"), col(yCol).as("y")), bessel = false)
    val p = cov.d
    // y width may differ from p: CovarianceModel assumes square; here both
    // arrays went through the same aggregator, so reconstruct raw moments
    val w = cov.weight
    val a = DenseMatrix.tabulate(p, p)((i, j) =>
      cov.cov00(i * p + j) * w + w * cov.mean0(i) * cov.mean0(j))
    val b = DenseMatrix.tabulate(p, p)((i, j) =>
      cov.cov0t(i * p + j) * w + w * cov.mean0(i) * cov.meant(j))
    (a, b, cov.count)
  }

  /** Ridge solve on the active set: (A_aa + alpha I) xi = b_a. */
  private def ridgeSolve(a: DenseMatrix[Double], b: DenseVector[Double],
                         active: Array[Int], alpha: Double): DenseVector[Double] = {
    val k = active.length
    val aa = DenseMatrix.tabulate(k, k)((i, j) =>
      a(active(i), active(j)) + (if (i == j) alpha else 0.0))
    val bb = DenseVector.tabulate(k)(i => b(active(i)))
    aa \ bb
  }

  /** STLSQ on precomputed normal equations (reference STLSQ._reduce):
    * iterate ridge-solve + threshold until the support stabilizes. */
  def stlsq(a: DenseMatrix[Double], b: DenseMatrix[Double], threshold: Double = 0.1,
            alpha: Double = 0.05, maxIter: Int = 20): DenseMatrix[Double] = {
    val p = a.rows
    val d = b.cols
    val coef = DenseMatrix.zeros[Double](d, p)
    for (i <- 0 until d) {
      var active = (0 until p).toArray
      var stable = false
      var iter = 0
      while (!stable && iter < maxIter && active.nonEmpty) {
        val xi = ridgeSolve(a, b(::, i), active, alpha)
        val kept = active.indices.filter(k => math.abs(xi(k)) >= threshold)
        val newActive = kept.map(active(_)).toArray
        coef(i, ::).t := DenseVector.zeros[Double](p)
        kept.foreach(k => coef(i, active(k)) = xi(k))
        stable = newActive.length == active.length
        active = newActive
        iter += 1
      }
      // final unthresholded refit on the stabilized support
      if (active.nonEmpty) {
        val xi = ridgeSolve(a, b(::, i), active, alpha)
        coef(i, ::).t := DenseVector.zeros[Double](p)
        active.indices.foreach(k => coef(i, active(k)) = xi(k))
      }
    }
    coef
  }

  /** Fit a SINDy model from the canonical trajectory frame. `dt` is the
    * frame spacing used by the derivative. `tvAlpha > 0` switches the
    * derivative estimate from the windowed central difference to the
    * total-variation-regularized derivative (graft.util.Diff.tvDerivative,
    * reference util/diff.py:138) — the denoising choice for noisy data
    * (reference tests/sindy noisy cases); it runs one trajectory per
    * executor group, so the scale contract is many moderate trajectories. */
  def fit(traj: DataFrame, inputDim: Int, degree: Int = 2, threshold: Double = 0.1,
          alpha: Double = 0.05, dt: Double = 1.0, maxIter: Int = 20,
          tvAlpha: Double = 0.0): SindyModel = {
    val lib = Monomials(degree)
    val p = lib.outputDim(inputDim)
    // the moments aggregator carries equally-wide x/y blocks; pad the
    // d-wide derivative target to the p-wide library with zeros (the extra
    // B columns are discarded below)
    // the gradient array itself is never NULL (nulls live in its elements);
    // endpoint-degenerate single-frame trajectories null every component
    val derivFrame =
      if (tvAlpha > 0)
        traj.join(graft.util.Diff.tvDerivativeFrame(traj, inputDim, tvAlpha, dt = dt),
          Seq(graft.core.Trajectories.TrajCol, graft.core.Trajectories.TimeCol))
      else gradientFrame(traj, inputDim, dt)
    val withGrad = derivFrame
      .where(col("xdot").getItem(0).isNotNull)
      .withColumn("theta", lib(col(FeatCol).cast("array<double>"), inputDim))
      .withColumn("xdot_p", concat(col("xdot").cast("array<double>"),
        array_repeat(lit(0.0), p - inputDim)))
    val (a, b0, _) = normalEquations(withGrad, "theta", "xdot_p")
    val b = b0(::, 0 until inputDim)
    val coef = stlsq(a, b, threshold, alpha, maxIter)
    val names = lib.exponents(inputDim).map { exps =>
      val s = exps.zipWithIndex.filter(_._1 > 0)
        .map { case (e, i) => if (e == 1) s"x$i" else s"x$i^$e" }.mkString(" ")
      if (s.isEmpty) "1" else s
    }
    SindyModel(graft.linalg.LinAlg.toFlat(coef), p, inputDim, lib, inputDim, names)
  }
}
