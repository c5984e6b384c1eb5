package graft.util

/** Statistics gathered over posterior/bootstrap samples of an arbitrary
  * model quantity (reference util/stats.py:197-290 `QuantityStatistics`
  * + :161 `evaluate_samples` + :10 `confidence_interval`).
  *
  * The reference resolves a string attribute path by reflection
  * ('timescales/0', 'transition_matrix'); the typed Scala equivalent is
  * an extractor function `M => Array[Double]` applied to each sample —
  * same contract (any possibly-nested model quantity), compile-checked.
  *
  * All statistics are element-wise over the flattened quantity: mean,
  * population std (ddof=0 like numpy's default `samples.std(axis=0)`),
  * and the reference's MEAN-ANCHORED confidence interval — NOT a plain
  * percentile: the fractional sorted-index of the mean `pm` anchors the
  * interval at [pm - conf*pm, pm + conf*(n - im)] with linear
  * interpolation between order statistics (stats.py:40-93).
  */
final case class QuantityStatistics(quantity: String,
                                    mean: Array[Double],
                                    std: Array[Double],
                                    lower: Array[Double],
                                    upper: Array[Double]) {
  def dim: Int = mean.length
}

object QuantityStatistics {

  /** Element-wise mean-anchored confidence interval of one coordinate
    * (stats.py:40 `_confidence_interval_1d`, remove_nans=False). */
  def confidenceInterval1d(xs: Array[Double], conf: Double): (Double, Double) = {
    require(conf >= 0 && conf <= 1, s"not a meaningful confidence level: $conf")
    if (xs.exists(_.isNaN)) return (Double.NaN, Double.NaN)
    val dMin = xs.min
    val dMax = xs.max
    if (conf == 1.0) return (dMin, dMax)
    if (math.abs(dMin - dMax) <= 1e-8 + 1e-5 * math.abs(dMax)) // np.isclose
      return (dMin, dMax)
    val m = xs.sum / xs.length
    val x = xs.sorted
    val n = x.length
    // index of the mean (np.searchsorted: first i with x(i) >= m)
    var im = 0
    while (im < n && x(im) < m) im += 1
    val pm =
      if (im == 0 || im == n ||
        ((m - x(im - 1)).isInfinite && (x(im) - x(im - 1)).isInfinite)) im.toDouble
      else (im - 1) + (m - x(im - 1)) / (x(im) - x(im - 1))
    def boundary(p: Double): Double = {
      val i1 = math.max(0, math.floor(p).toInt)
      val i2 = math.min(n - 1, math.ceil(p).toInt)
      if (math.abs(x(i1) - x(i2)) <= 1e-8 + 1e-5 * math.abs(x(i2))) x(i1)
      else x(i1) + (p - i1) * (x(i2) - x(i1))
    }
    val pl = pm - conf * pm
    val pr = pm + conf * (n - im)
    (boundary(pl), boundary(pr))
  }

  /** Gather statistics for a vector-valued quantity extracted from each
    * sample model (stats.py:240 `gather`). */
  def gather[M](samples: Seq[M], f: M => Array[Double],
                quantity: String = "", confidence: Double = 0.95): QuantityStatistics = {
    require(samples.nonEmpty, "gather needs at least one sample")
    val evaluated = samples.map(f)
    val d = evaluated.head.length
    require(evaluated.forall(_.length == d), "inconsistent quantity shape across samples")
    val n = evaluated.length
    val mean = Array.tabulate(d)(i => evaluated.map(_(i)).sum / n)
    val std = Array.tabulate(d) { i =>
      val mu = mean(i)
      math.sqrt(evaluated.map(v => (v(i) - mu) * (v(i) - mu)).sum / n) // ddof=0
    }
    val lo = new Array[Double](d)
    val hi = new Array[Double](d)
    var i = 0
    while (i < d) {
      val (l, r) = confidenceInterval1d(evaluated.map(_(i)).toArray, confidence)
      lo(i) = l; hi(i) = r
      i += 1
    }
    QuantityStatistics(quantity, mean, std, lo, hi)
  }

  /** Scalar-quantity convenience overload. */
  def gatherScalar[M](samples: Seq[M], f: M => Double,
                      quantity: String = "",
                      confidence: Double = 0.95): QuantityStatistics =
    gather[M](samples, (m: M) => Array(f(m)), quantity, confidence)
}
