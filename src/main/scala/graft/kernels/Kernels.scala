package graft.kernels

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kernel functions (reference kernels/_base.py:4-128, _kernels.py:7-140):
  * scalar k(x,y) as codegen column expressions over two ARRAY<DOUBLE>
  * columns; Gram matrices via either a broadcast pairwise job (T modest) or
  * driver evaluation on a collected sample (Nystrom-style size cap for the
  * T x T methods — SURVEY §7 hard list #4). */
trait Kernel extends Serializable {
  def apply(x: Column, y: Column): Column
  def applyArrays(x: Array[Double], y: Array[Double]): Double
}

object Kernels {
  @inline private[kernels] def sqdistArr(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    s
  }

  /** Squared euclidean distance between two array columns (fold, compact
    * codegen). */
  def sqdist(x: Column, y: Column): Column =
    aggregate(zip_with(x.cast("array<double>"), y.cast("array<double>"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, v) => acc + v)

  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x.cast("array<double>"), y.cast("array<double>"),
      (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  /** Pairwise kernel table k(x_i, y_j) for all rows of two frames — the
    * `apply(X1, X2)` surface. Broadcast the smaller side. */
  def pairwise(k: Kernel, left: DataFrame, right: DataFrame,
               idL: String, idR: String, vecCol: String = "features"): DataFrame = {
    val l = left.select(col(idL).as("i"), col(vecCol).as("xi"))
    val r = right.select(col(idR).as("j"), col(vecCol).as("xj"))
    l.crossJoin(broadcast(r)).select(col("i"), col("j"), k(col("xi"), col("xj")).as("k"))
  }

  /** Driver-side Gram matrix on a collected (size-capped) sample. */
  def gram(k: Kernel, xs: Array[Array[Double]]): DenseMatrix[Double] = {
    val n = xs.length
    DenseMatrix.tabulate(n, n)((i, j) => k.applyArrays(xs(i), xs(j)))
  }
}

/** exp(-||x-y||^2 / (2 sigma^2)) (kernels/_kernels.py GaussianKernel). */
case class GaussianKernel(sigma: Double) extends Kernel {
  def apply(x: Column, y: Column): Column =
    exp(Kernels.sqdist(x, y) * lit(-1.0 / (2.0 * sigma * sigma)))
  def applyArrays(x: Array[Double], y: Array[Double]): Double =
    math.exp(-Kernels.sqdistArr(x, y) / (2.0 * sigma * sigma))
}

/** exp(-||x-y||_2 / sigma) (kernels/_kernels.py LaplacianKernel). */
case class LaplacianKernel(sigma: Double) extends Kernel {
  def apply(x: Column, y: Column): Column =
    exp(sqrt(Kernels.sqdist(x, y)) * lit(-1.0 / sigma))
  def applyArrays(x: Array[Double], y: Array[Double]): Double =
    math.exp(-math.sqrt(Kernels.sqdistArr(x, y)) / sigma)
}

/** exp(-1/2 sum_i (x_i-y_i)^2 / sigma_i^2) — per-dimension bandwidths
  * (kernels/_kernels.py:65 GeneralizedGaussianKernel). */
case class GeneralizedGaussianKernel(sigmas: Array[Double]) extends Kernel {
  private val inv2 = sigmas.map(s => 1.0 / (2.0 * s * s))
  def apply(x: Column, y: Column): Column =
    exp(sigmas.indices.map { i =>
      val d = x.getItem(i) - y.getItem(i)
      d * d * lit(-inv2(i))
    }.reduce(_ + _))
  def applyArrays(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d * inv2(i); i += 1 }
    math.exp(-s)
  }
}

/** (x.y + c)^p (kernels/_kernels.py PolynomialKernel). */
case class PolynomialKernel(degree: Int, c: Double) extends Kernel {
  def apply(x: Column, y: Column): Column =
    pow(Kernels.dot(x, y) + lit(c), degree)
  def applyArrays(x: Array[Double], y: Array[Double]): Double = {
    var s = c; var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    math.pow(s, degree)
  }
}
