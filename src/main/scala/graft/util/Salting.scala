package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities — the "one hot key owns most of the data"
  * fixes the 100 TB plan needs (SURVEY §4: salting + AQE skew-join).
  *
  * Spark's hash aggregation already map-side-combines algebraic aggregates
  * (sum/count/min/max), so salting adds nothing there. The aggregates that
  * DO melt a reducer under skew are the holistic ones — exact distinct
  * counts and collects — whose per-key state is proportional to the number
  * of distinct values landing on one task. The two-phase shapes here cap
  * that state by hash-partitioning the VALUE space first. */
object Salting {

  /** Exact distinct count per key group, skew-safe: phase 1 counts
    * distinct values per (keys, value-hash-bucket) — each reducer holds at
    * most |distinct|/buckets values for the hottest key — phase 2 sums the
    * bucket counts, which is exact because the hash buckets PARTITION the
    * value space. Output: keys + `n_distinct`. */
  def skewAwareDistinctCount(df: DataFrame, keyCols: Seq[String],
                             valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val keys = keyCols.map(col)
    df.select(keys :+ col(valueCol): _*)
      .withColumn("__bucket", pmod(xxhash64(col(valueCol)), lit(buckets)))
      .groupBy(keys :+ col("__bucket"): _*)
      .agg(countDistinct(col(valueCol)).as("__part"))
      .groupBy(keys: _*)
      .agg(sum(col("__part")).as("n_distinct"))
  }

  /** Salted broadcast-side replication for a skewed join: explode the
    * (small) build side `buckets` times and salt the probe side's key with
    * a random-ish hash bucket, so one hot join key spreads over `buckets`
    * tasks. Returns (saltedProbe, replicatedBuild); the caller joins them
    * on `keyCol` AND the generated `__salt` column. */
  def saltJoinSides(probe: DataFrame, build: DataFrame, keyCol: String,
                    buckets: Int, probeTieBreak: String):
      (DataFrame, DataFrame) = {
    require(buckets > 0, "buckets must be positive")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col(probeTieBreak)), lit(buckets)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    (salted, replicated)
  }
}
