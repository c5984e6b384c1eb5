package graft.clustering

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Trajectories.FeatCol

/** Box (uniform grid) discretization — reference clustering/_box.py:51-101.
  * Pure SQL: per-dimension floor binning + linearized cell index; fully
  * codegen'd, zero custom code at execution time. */
object BoxDiscretization {

  case class BoxModel(v0: Array[Double], v1: Array[Double], nBins: Array[Int]) {
    val d: Int = v0.length

    /** Linearized cell index column for a features array. */
    def assignColumn(feat: Column): Column = {
      // per-dim bin: clamp to [0, n-1]; linearize row-major
      val bins = (0 until d).map { i =>
        val width = (v1(i) - v0(i)) / nBins(i)
        least(greatest(floor((feat.getItem(i) - lit(v0(i))) / lit(width)), lit(0.0)),
          lit((nBins(i) - 1).toDouble)).cast("int")
      }
      bins.zipWithIndex.map { case (b, i) =>
        val mult = nBins.drop(i + 1).product
        b * lit(mult)
      }.reduce(_ + _)
    }
  }

  /** Fit = one min/max aggregate per dimension (single cheap job). */
  def fit(traj: DataFrame, nBins: Array[Int], featCol: String = FeatCol): BoxModel = {
    val d = nBins.length
    val aggs = (0 until d).flatMap(i =>
      Seq(min(col(featCol).getItem(i)).as(s"mn$i"), max(col(featCol).getItem(i)).as(s"mx$i")))
    val r = traj.agg(aggs.head, aggs.tail: _*).collect()(0)
    val v0 = Array.tabulate(d)(i => r.getDouble(2 * i))
    val v1 = Array.tabulate(d)(i => r.getDouble(2 * i + 1))
    BoxModel(v0, v1, nBins)
  }

  def transform(traj: DataFrame, m: BoxModel, featCol: String = FeatCol): DataFrame =
    traj.withColumn("state", m.assignColumn(col(featCol)))
}

/** Cluster model + nearest-center assignment
  * (reference clustering/_cluster_model.py:101; kmeans_bits.h assignment
  * loop). Assignment is a broadcast-centers argmin expressed with plain
  * column arithmetic for small k*d (codegen), falling back to a UDF for
  * larger models. */
case class ClusterModel(centers: Array[Array[Double]]) {
  val k: Int = centers.length
  val d: Int = if (k > 0) centers(0).length else 0

  def assignColumn(feat: Column): Column = {
    if (k * d <= 256) {
      // codegen-friendly: explicit argmin over k squared distances
      val dists = centers.map { c =>
        (0 until d).map(i => {
          val diff = feat.getItem(i) - lit(c(i))
          diff * diff
        }).reduce(_ + _)
      }
      // argmin via struct sort: array of (dist, idx), array_min, extract idx
      val pairs = dists.zipWithIndex.map { case (dc, i) =>
        struct(dc.as("dist"), lit(i).as("idx"))
      }
      array_min(array(pairs: _*)).getField("idx")
    } else {
      val cs = centers
      val f = udf { (x: Seq[Double]) =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < cs.length) {
          var s = 0.0; var i = 0
          while (i < x.length) { val t = x(i) - cs(j)(i); s += t * t; i += 1 }
          if (s < bestD) { bestD = s; best = j }
          j += 1
        }
        best
      }
      f(feat)
    }
  }

  def transform(traj: DataFrame, featCol: String = FeatCol): DataFrame =
    traj.withColumn("state", assignColumn(col(featCol)))
}

/** Lloyd k-means on the canonical trajectory frame via Spark MLlib
  * (reference clustering/_kmeans.py; MLlib = broadcast centers +
  * treeAggregate partial sums, the exact distributed shape SURVEY §2.7
  * prescribes). Deterministic via fixed seed. */
/** Standalone k-means++ seeding (reference clustering/_kmeans.py exports
  * `kmeans_plusplus`; MLlib's fit path uses k-means|| internally — this is
  * the composable initializer for custom loops). D^2-weighted selection
  * runs on the driver over a deterministic hash-sampled row cap: seeding
  * quality needs a representative sample, not the corpus, so the 100 TB
  * contract is the same row-capped landmark rule as the kernel methods. */
object KMeansPlusPlus {
  def seed(traj: DataFrame, k: Int, seedVal: Long = 42L,
           maxSampleRows: Long = 65536L, featCol: String = FeatCol): Array[Array[Double]] = {
    require(k > 0, "k must be positive")
    val n = traj.count()
    val frac = if (n <= maxSampleRows) 1.0 else maxSampleRows.toDouble / n
    val rows = traj.sample(withReplacement = false, frac, seedVal)
      .select(col(featCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "empty input")
    val rnd = new java.util.Random(seedVal)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val centers = scala.collection.mutable.ArrayBuffer(rows(rnd.nextInt(rows.length)))
    val minD2 = rows.map(d2(_, centers(0)))
    while (centers.length < math.min(k, rows.length)) {
      val total = minD2.sum
      val pick =
        if (total <= 0) rnd.nextInt(rows.length)
        else {
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < rows.length - 1 && r >= minD2(i)) { r -= minD2(i); i += 1 }
          i
        }
      val c = rows(pick)
      centers += c
      var i = 0
      while (i < rows.length) { minD2(i) = math.min(minD2(i), d2(rows(i), c)); i += 1 }
    }
    centers.toArray
  }
}

object KMeans {
  def fit(traj: DataFrame, k: Int, maxIter: Int = 50, seed: Long = 42L,
          featCol: String = FeatCol, tol: Double = 1e-4): ClusterModel = {
    import org.apache.spark.ml.functions.array_to_vector
    val df = traj.select(array_to_vector(col(featCol).cast("array<double>")).as("fv"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed).setFeaturesCol("fv").setTol(tol)
    val model = km.fit(df)
    ClusterModel(model.clusterCenters.map(_.toArray))
  }
}
