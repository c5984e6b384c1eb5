package graft.markov

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Trajectories.{TrajCol, TimeCol}

/** Transition counting (reference markov/_transition_counting.py,
  * markov/tools/estimation/api.py:63-153).
  *
  * Distributed shape: lead(state, tau) over traj-partitioned window, then
  * groupBy(s0, s1).count — one shuffle by traj_id for the window (none if
  * ingest is bucketed), one partial-aggregated shuffle of at most n^2 rows
  * for the count. The COO count frame stays distributed until a driver
  * collect of n^2 <= ~25M entries builds the model matrix.
  */
object TransitionCounting {

  private def w = Window.partitionBy(TrajCol).orderBy(TimeCol)

  /** Sliding-window pair counts at lag tau: all (s_t, s_{t+tau}).
    * Blank states (-1) excluded, matching dtraj semantics. */
  def slidingCounts(dtraj: DataFrame, tau: Int): DataFrame =
    dtraj
      .withColumn("s1", lead(col("state"), tau).over(w))
      .where(col("s1").isNotNull && col("state") >= 0 && col("s1") >= 0)
      .groupBy(col("state").as("s0"), col("s1"))
      .agg(count(lit(1)).as("cnt"))

  /** Sliding counts KEEPING terminal/blank-successor frames as rows with
    * s1 NULL (or s1 < 0): every observed valid frame then appears exactly
    * once as s0, so `SELECT DISTINCT s0` of this result IS the observed
    * state set — one scan serves both the count matrix and its support,
    * where the separate `distinct` pass cost a second full scan. Pair
    * rows are exactly `s1 IS NOT NULL AND s1 >= 0`. */
  def slidingCountsWithTerminals(dtraj: DataFrame, tau: Int): DataFrame =
    dtraj
      .withColumn("s1", lead(col("state"), tau).over(w))
      .where(col("state") >= 0)
      .groupBy(col("state").as("s0"), col("s1"))
      .agg(count(lit(1)).as("cnt"))

  /** Sample-mode counts: pairs at t = 0, tau, 2tau, ...
    * (estimation/api.py count_matrix sample mode). */
  def sampleCounts(dtraj: DataFrame, tau: Int): DataFrame =
    dtraj
      .withColumn("s1", lead(col("state"), tau).over(w))
      .where(col("s1").isNotNull && (col(TimeCol) % tau) === 0 &&
        col("state") >= 0 && col("s1") >= 0)
      .groupBy(col("state").as("s0"), col("s1"))
      .agg(count(lit(1)).as("cnt"))

  /** Sliding counts divided by tau (sliding-effective,
    * _transition_counting.py:625-628). */
  def slidingEffectiveCounts(dtraj: DataFrame, tau: Int): DataFrame =
    slidingCounts(dtraj, tau)
      .select(col("s0"), col("s1"), (col("cnt") / tau.toDouble).as("cnt_eff"))

  /** Girsanov-reweighted transition counts (reference
    * markov/_girsanov_reweighted_transition_counting.py;
    * estimation/sparse/count_matrix.py:68-87, Schaefer et al. 2024):
    * each sliding transition t -> t+tau carries weight
    * g_t * exp(-sum_{s=t+1..t+tau} logM_s). The path-weight rolling sum is
    * a frames-between window aggregate — one shuffle, pure codegen. */
  def girsanovReweightedCounts(dtraj: DataFrame, tau: Int,
                               gCol: String = "g", logMCol: String = "logM"): DataFrame = {
    val mWindow = w.rowsBetween(1, tau)
    dtraj
      .withColumn("s1", lead(col("state"), tau).over(w))
      .withColumn("m_sum", sum(col(logMCol)).over(mWindow))
      .where(col("s1").isNotNull && col("state") >= 0 && col("s1") >= 0)
      .withColumn("weight", col(gCol) * exp(-col("m_sum")))
      .groupBy(col("state").as("s0"), col("s1"))
      .agg(sum(col("weight")).as("cnt_reweighted"))
  }

  /** Per-state visit histogram ignoring blanks (markov/_util.py:25
    * `count_states`). */
  def stateHistogram(dtraj: DataFrame): DataFrame =
    dtraj.where(col("state") >= 0)
      .groupBy("state").agg(count(lit(1)).as("cnt"))

  /** Distinct visited states (markov/_util.py:6 `visited_set`). */
  def visitedSet(dtraj: DataFrame): DataFrame =
    dtraj.where(col("state") >= 0).select("state").distinct()

  /** Sliding counts from already-collected trajectory arrays (zero Spark
    * jobs). For model-sized batteries that collect the dtraj once and feed
    * several estimators from the same arrays; semantics identical to
    * `slidingCounts` (pairs containing a blank state are dropped, rows are
    * NOT re-indexed around blanks). */
  def slidingCountsLocal(trajs: Iterable[Array[Int]], tau: Int,
                         n: Int): breeze.linalg.DenseMatrix[Double] = {
    val m = breeze.linalg.DenseMatrix.zeros[Double](n, n)
    trajs.foreach { arr =>
      var i = 0
      while (i + tau < arr.length) {
        val a = arr(i); val b = arr(i + tau)
        if (a >= 0 && b >= 0) m(a, b) += 1.0
        i += 1
      }
    }
    m
  }

  /** Collect a COO count frame into a dense matrix (driver; n known small). */
  def toDense(counts: DataFrame, n: Int): breeze.linalg.DenseMatrix[Double] = {
    val m = breeze.linalg.DenseMatrix.zeros[Double](n, n)
    counts.select("s0", "s1", "cnt").collect().foreach { r =>
      m(r.getInt(0), r.getInt(1)) = r.getLong(2).toDouble
    }
    m
  }
}
