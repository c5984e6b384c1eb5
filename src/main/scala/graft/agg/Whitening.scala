package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.linalg.LinAlg

/** Whitening transform y = C00^{-1/2} (x - mu)
  * (reference covariance/_covariance.py:19-49 WhiteningTransform,
  * CovarianceModel.whiten :154-175).
  *
  * Model is d x d on the driver; application is a broadcast-free codegen
  * column expression (the matrix enters as literals — no UDF, no state). */
case class WhiteningModel(mean: Array[Double], w: Array[Double], d: Int) {

  /** Column: whitened feature array. */
  def projection(feat: Column): Column = {
    val comps = (0 until d).map { r =>
      (0 until d).map { c =>
        (feat.getItem(c) - lit(mean(c))) * lit(w(r * d + c))
      }.reduce(_ + _)
    }
    array(comps: _*)
  }

  def transform(df: DataFrame, featCol: String = graft.core.Trajectories.FeatCol): DataFrame =
    df.withColumn("whitened", projection(col(featCol)))
}

object Whitening {
  /** Fit from data: one covariance pass + driver inverse sqrt. */
  def fit(traj: DataFrame, epsilon: Double = 1e-10): WhiteningModel = {
    val cov = Covariance.fitFeatures(traj)
    fromCovariance(cov, epsilon)
  }

  def fromCovariance(cov: CovarianceModel, epsilon: Double = 1e-10): WhiteningModel = {
    val c00 = LinAlg.fromFlat(cov.cov00, cov.d)
    val w = LinAlg.spdInvSqrt(c00, epsilon)
    WhiteningModel(cov.mean0, LinAlg.toFlat(w), cov.d)
  }
}
