package graft.clustering

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Trajectories.FeatCol

/** Clustering metrics (reference clustering/_metric.py:6-71 metric
  * registry). A Metric supplies both an executor-side scalar function
  * (regspace / minibatch inner loops) and a codegen Column expression
  * (assignment path). */
trait Metric extends Serializable {
  def name: String
  def dist(x: Array[Double], y: Array[Double]): Double
  /** squared-or-monotone distance column between an array column and a
    * literal center (used for argmin assignment — any monotone transform
    * of the true distance is fine). */
  def distColumn(feat: Column, center: Array[Double]): Column
}

object EuclideanMetric extends Metric {
  val name = "euclidean"
  def dist(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  def distColumn(feat: Column, center: Array[Double]): Column =
    center.indices.map { i =>
      val d = feat.getItem(i) - lit(center(i)); d * d
    }.reduce(_ + _)
}

object ManhattanMetric extends Metric {
  val name = "manhattan"
  def dist(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += math.abs(x(i) - y(i)); i += 1 }
    s
  }
  def distColumn(feat: Column, center: Array[Double]): Column =
    center.indices.map(i => abs(feat.getItem(i) - lit(center(i)))).reduce(_ + _)
}

object ChebyshevMetric extends Metric {
  val name = "chebyshev"
  def dist(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s = math.max(s, math.abs(x(i) - y(i))); i += 1 }
    s
  }
  def distColumn(feat: Column, center: Array[Double]): Column =
    greatest(center.indices.map(i => abs(feat.getItem(i) - lit(center(i)))): _*)
}

/** Name -> Metric registry (the `metrics` object of _metric.py). */
object Metrics {
  private val registry = scala.collection.mutable.Map[String, Metric](
    EuclideanMetric.name -> EuclideanMetric,
    ManhattanMetric.name -> ManhattanMetric,
    ChebyshevMetric.name -> ChebyshevMetric)
  def register(m: Metric): Unit = registry(m.name) = m
  def apply(name: String): Metric =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"Unknown metric $name, available: ${registry.keys.mkString(", ")}"))
  def available: Seq[String] = registry.keys.toSeq.sorted
}

/** Regular-space clustering (reference clustering/_regspace.py:14-170;
  * Prinz et al. 2011 / Hartigan leader algorithm): greedily admit any point
  * farther than `dmin` from all current centers.
  *
  * Distributed shape: the reference streams data points serially — at
  * 100 TB that's a single-reader bottleneck. Here each PARTITION runs the
  * leader pass locally (bounded output: at most maxCenters candidates per
  * partition), and the driver re-runs the same pass over the concatenated
  * candidate stream. Every surviving pair of centers is > dmin apart
  * (exactly as the reference), and every data point is within 2*dmin of a
  * center (vs dmin for the serial order) — the standard streaming-leader
  * approximation bound; the serial result is itself input-order-dependent,
  * so neither is canonical. */
object RegularSpace {

  def fit(traj: DataFrame, dmin: Double, maxCenters: Int = 1000,
          metric: Metric = EuclideanMetric, featCol: String = FeatCol): ClusterModel = {
    require(dmin >= 0, "dmin must be non-negative")
    require(maxCenters > 0, "maxCenters must be positive")
    val spark = traj.sparkSession
    import spark.implicits._
    val m = metric
    val cap = maxCenters
    val dm = dmin
    val candidates: Array[Array[Double]] = traj
      .select(col(featCol).cast("array<double>"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        val centers = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        it.foreach { xs =>
          if (centers.length < cap) {
            val x = xs.toArray
            var far = true
            var i = 0
            while (i < centers.length && far) {
              if (m.dist(x, centers(i)) < dm) far = false
              i += 1
            }
            if (far) centers += x
          }
        }
        centers.iterator.map(_.toSeq)
      }
      .collect().map(_.toArray)
    // driver merge: same leader pass over candidates
    val centers = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    candidates.foreach { x =>
      if (centers.length < maxCenters &&
          centers.forall(c => metric.dist(x, c) >= dmin)) centers += x
    }
    ClusterModel(centers.toArray)
  }
}

/** Mini-batch k-means (reference clustering/_kmeans.py:474-559
  * MiniBatchKMeans): per-epoch shuffled batches, each batch runs one Lloyd
  * update on the batch only; converged when the batch cost stops moving.
  *
  * Distributed shape: a batch is a seeded `sample` of the table; the Lloyd
  * update on the batch is a broadcast-centers map + one tiny aggregation of
  * (sum, count) per center — the full table is never shuffled, and each
  * epoch touches only fraction*|T| rows. */
object MiniBatchKMeans {

  def fit(traj: DataFrame, k: Int, batchFraction: Double = 0.1, maxEpochs: Int = 5,
          batchesPerEpoch: Int = 10, tolerance: Double = 1e-5, seed: Long = 42L,
          featCol: String = FeatCol): ClusterModel = {
    val spark = traj.sparkSession
    import spark.implicits._
    // cache the projected frame ONCE: every mini-batch is a seeded sample
    // of it, and without the cache each of the up-to maxEpochs *
    // batchesPerEpoch sequential batch jobs re-scans the source (parquet +
    // any upstream window) — the same many-small-jobs pathology that blew
    // up q73 under driver contention. Same seeds on the cached frame draw
    // identical batches, so the model is unchanged.
    val data = traj.select(col(featCol).cast("array<double>").as("x")).cache()
    try {
    // init: k-means|| on one batch (reference init_strategy kmeans++)
    var centers = KMeans.fit(
      data.sample(withReplacement = false, math.min(1.0, batchFraction), seed)
        .select(col("x").as(featCol)), k, maxIter = 5, seed = seed,
      featCol = featCol).centers
    var lastCost = Double.MaxValue
    var converged = false
    var batch = 0
    val totalBatches = maxEpochs * batchesPerEpoch
    while (batch < totalBatches && !converged) {
      val sampled = data.sample(withReplacement = false,
        math.min(1.0, batchFraction), seed + 1 + batch)
      val bc = spark.sparkContext.broadcast(centers)
      val agg = sampled.as[Seq[Double]]
        .mapPartitions { it =>
          val cs = bc.value
          val kk = cs.length
          val d = if (kk > 0) cs(0).length else 0
          val sums = Array.ofDim[Double](kk, d)
          val counts = new Array[Long](kk)
          var cost = 0.0
          it.foreach { xs =>
            val x = xs.toArray
            var best = 0; var bestD = Double.MaxValue
            var j = 0
            while (j < kk) {
              var s = 0.0; var i = 0
              while (i < d) { val t = x(i) - cs(j)(i); s += t * t; i += 1 }
              if (s < bestD) { bestD = s; best = j }
              j += 1
            }
            counts(best) += 1
            var i = 0
            while (i < d) { sums(best)(i) += x(i); i += 1 }
            cost += bestD
          }
          Iterator.single((sums.map(_.toSeq).toSeq, counts.toSeq, cost))
        }
        .reduce { (a, b) =>
          val sums = a._1.zip(b._1).map { case (ra, rb) => ra.zip(rb).map(t => t._1 + t._2) }
          val counts = a._2.zip(b._2).map(t => t._1 + t._2)
          (sums, counts, a._3 + b._3)
        }
      val (sums, counts, cost) = agg
      centers = centers.indices.map { j =>
        if (counts(j) > 0) sums(j).map(_ / counts(j)).toArray else centers(j)
      }.toArray
      val relChange = if (cost != 0.0) math.abs(cost - lastCost) / cost else 0.0
      if (relChange <= tolerance) converged = true
      lastCost = cost
      bc.destroy()
      batch += 1
    }
    ClusterModel(centers)
    } finally { data.unpersist(); () }
  }
}
