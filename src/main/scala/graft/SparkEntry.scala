package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each `queries` entry is one operator of the SURVEY §2 inventory (or a
  * training-data-pipeline extension) run against the TPC-H-ish testdata;
  * `oracleSql` holds the exact DuckDB twin for the SQL-expressible ones.
  * The registry is split into per-family objects under graft.queries
  * (QShared carries the shared helpers); this object concatenates them.
  * Conventions for hash-parity with the oracle:
  *  - every computed column carries the same alias on both sides;
  *  - float outputs are rounded (6 dp after keeping magnitudes O(1)-O(100));
  *  - counts stay integer (exact); DuckDB integer sums are cast to BIGINT
  *    to match Spark's LongType.
  */
object SparkEntry {

  private val families: Seq[QueryFamily] = Seq(
    CoreQueries, MarkovQueries, MarkovBatteryQueries, DecompositionQueries, TextQueries,
    DedupQueries, SimilarityQueries, PipelineQueries, EventQueries,
    StreamingQueries, MultimodalQueries)

  /** Flagship query on sf=0.001: TICA pipeline end-to-end (scan -> lag
    * window -> covariance aggregate -> driver eig -> broadcast projection).
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q29_tica_projection")(spark, "/root/testdata/sf0.001")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = families.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size, "duplicate query keys")
    all.toMap
  }

  lazy val oracleSql: Map[String, String] = {
    val all = families.flatMap(_.oracles)
    require(all.map(_._1).distinct.size == all.size, "duplicate oracle keys")
    all.toMap
  }
}
