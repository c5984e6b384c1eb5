package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Trajectories.{TrajCol, TimeCol}

/** Statistics utilities (reference util/stats.py): autocorrelation,
  * statistical inefficiency, bootstrap resampling, confidence intervals. */
object Stats {

  private def w = Window.partitionBy(TrajCol).orderBy(TimeCol)

  /** Autocorrelation of a value column at the given lags, pooled over
    * trajectories (building block of `statistical_inefficiency`,
    * util/stats.py:292): acf(k) = cov(x_t, x_{t+k}) / var(x).
    * One window pass + one aggregate; entirely SQL-expressible. */
  def autocorrelation(traj: DataFrame, valueCol: String, lags: Seq[Int]): DataFrame = {
    val withLeads = lags.foldLeft(traj) { (df, k) =>
      df.withColumn(s"lead_$k", lead(col(valueCol), k).over(w))
    }
    val aggs = Seq(
      count(col(valueCol)).as("n"),
      avg(col(valueCol)).as("mean"),
      var_pop(col(valueCol)).as("var")) ++
      lags.flatMap { k =>
        Seq(covar_pop(col(valueCol), col(s"lead_$k")).as(s"cov_$k"))
      }
    val r = withLeads.agg(aggs.head, aggs.tail: _*).collect()(0)
    val spark = traj.sparkSession
    import spark.implicits._
    val variance = r.getAs[Double]("var")
    lags.map(k => (k, r.getAs[Double](s"cov_$k") / variance))
      .toDF("lag", "acf")
  }

  /** Statistical inefficiency I = 1 + 2 sum_k (1 - k/N) acf(k), truncated
    * at first negative acf (initial positive sequence estimator,
    * util/stats.py:292 semantics). Driver-side on the acf table. */
  def statisticalInefficiency(traj: DataFrame, valueCol: String, maxLag: Int): Double = {
    val acf = autocorrelation(traj, valueCol, 1 to maxLag)
      .orderBy("lag").collect().map(_.getDouble(1))
    var s = 0.0
    var k = 0
    while (k < acf.length && acf(k) > 0) { s += acf(k); k += 1 }
    1.0 + 2.0 * s
  }

  /** Bootstrap resample of whole trajectories with replacement
    * (estimation/api.py:300 bootstrap_trajectories): returns the resampled
    * trajectory frame; seeded and deterministic.
    *
    * Fully distributed: trajectory ids are never collected to the driver
    * (at 1e8+ trajectories that would OOM). The draw is a seeded hash over
    * `spark.range(n)` joined to a zipWithIndex-indexed distinct-id table;
    * the only driver-side value is the id COUNT. */
  def bootstrapTrajectories(traj: DataFrame, seed: Long,
                            windowIndexThreshold: Long = 33554432L,
                            nTrajsHint: Long = -1L): DataFrame = {
    val spark = traj.sparkSession
    import spark.implicits._
    val ids = traj.select(col(TrajCol)).distinct()
    // callers that already know the trajectory count (e.g. from an
    // earlier per-trajectory aggregate) pass it to skip the count job
    val n = if (nTrajsHint >= 0) nTrajsHint else ids.count()
    // Dense 0..n-1 index over the distinct ids. Below the threshold a
    // row_number window builds it LAZILY inside the consumer's own job
    // (one action total instead of the zipWithIndex path's two eager
    // materializations — the id table is #trajectories rows, far smaller
    // than the data, so a single-partition sort of it is cheap). Above
    // the threshold (1e8-trajectory regime) the distributed zipWithIndex
    // takes over; both paths assign idx by ascending id, so draws are
    // identical either way.
    val indexed =
      if (n <= windowIndexThreshold)
        ids.withColumn("idx", (row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(TrajCol)) - 1).cast("long"))
      else
        // GlobalIndex's Tungsten-path two-pass (range-partitioned sort +
        // broadcast offsets, frozen inside) — r14: replaces an
        // orderBy.rdd.zipWithIndex round-trip through boxed rows
        graft.operators.GlobalIndex.withGlobalIndex(ids, "idx", col(TrajCol))
    // boot_id -> uniformly drawn source index, deterministic in (seed, id)
    val draws = spark.range(n).select(col("id").as("boot_id"),
      pmod(xxhash64(lit(seed), col("id")), lit(n)).as("idx"))
    val mapping = draws.join(indexed, "idx").select(col("boot_id"), col(TrajCol))
    val others = traj.columns.filter(c => c != TrajCol && c != TimeCol).map(col).toSeq
    traj.join(mapping, TrajCol)
      .select(Seq(col("boot_id").as(TrajCol), col(TimeCol)) ++ others: _*)
  }

  /** Exact discrete quantiles of a numeric column: value at rank
    * ceil(q*n) in ascending order (percentile_disc semantics — the
    * smallest value whose cumulative rank reaches q).
    *
    * Scale shape: exact quantiles are inherently a total order, but a
    * total order is NOT a single-partition sort — the global rank comes
    * from a range-partitioned `orderBy` (every partition sorts its own
    * value range) plus `zipWithIndex`'s per-partition offsets (one extra
    * count pass), the same decomposition the bootstrap indexer above
    * uses past its window threshold. The r10 shape was a no-partition
    * row_number window — Spark's "Moving all data to a single partition"
    * WARN, a driver-sized sort at 100 TB. (`approx_percentile` remains
    * the cheaper one-pass choice when exactness isn't required.) */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val ranks = qs.map(q => q -> math.max(1L, math.ceil(q * n).toLong)).toDF("q", "rn")
    // the global rank comes from GlobalIndex's size-dispatched
    // decomposition (r14: this replaces a sorted.rdd.zipWithIndex →
    // Row(...) → createDataFrame GenericRow round-trip — the same boxed
    // full-corpus loop the GlobalIndex rewrite removed): plain window
    // below the threshold (model-sized report frames skip the two-pass
    // freeze — the n we already counted rides along as knownCount, so
    // the dispatch is free), Tungsten-path range-partitioned two-pass
    // above it. Equal values may take either rank inside a tie run; the
    // rank→value lookup is value-identical either way, which is all
    // percentile_disc needs.
    val ranked = graft.operators.GlobalIndex
      .withGlobalIndexAuto(df.select(col(valueCol).as("v")), "rn0",
        Seq(col("v")), knownCount = n)
      .select((col("rn0") + 1L).as("rn"), col("v"))
    ranks.join(ranked, "rn").select(col("q"), col("v"))
  }

  /** Percentile confidence interval over per-sample values
    * (util/stats.py:10 confidence_interval). */
  def confidenceInterval(samples: Seq[Double], conf: Double = 0.95): (Double, Double) = {
    val sorted = samples.sorted
    val lo = (1.0 - conf) / 2.0
    def q(p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val i = idx.toInt
      if (i + 1 < sorted.length) sorted(i) + (idx - i) * (sorted(i + 1) - sorted(i))
      else sorted.last
    }
    (q(lo), q(1.0 - lo))
  }

  /** Weighted 1-d histogram over fixed bounds (util/stats.py histogram
    * building block): (bin, weight_sum). */
  def histogram1d(df: DataFrame, valueCol: String, weightCol: Option[String],
                  lo: Double, hi: Double, nBins: Int): DataFrame = {
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")
    val wcol = weightCol.map(col).getOrElse(lit(1.0))
    df.groupBy(bin.as("bin")).agg(sum(wcol).as("wsum"))
  }
}
