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

  /** Column: whitened feature array. Unrolled codegen for narrow d; a
    * captured-array gemv UDF above d*d=256 terms (wide/embedding features
    * would otherwise blow up whole-stage codegen compile time). */
  def projection(feat: Column): Column =
    if (d * d <= 256) {
      val comps = (0 until d).map { r =>
        (0 until d).map { c =>
          (feat.getItem(c) - lit(mean(c))) * lit(w(r * d + c))
        }.reduce(_ + _)
      }
      array(comps: _*)
    } else {
      val m = mean; val ww = w; val dd = d
      val gemv = udf { (x: Seq[Double]) =>
        val out = new Array[Double](dd)
        var r = 0
        while (r < dd) {
          var s = 0.0
          var c = 0
          while (c < dd) { s += (x(c) - m(c)) * ww(r * dd + c); c += 1 }
          out(r) = s
          r += 1
        }
        out
      }
      gemv(feat.cast("array<double>"))
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
