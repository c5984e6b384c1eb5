package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed physical layout for co-located joins — the 100 TB contract for
  * fact-to-fact joins (q72's shape): two tables bucketed AND sorted by the
  * join key join with ZERO exchanges and zero sorts; the scan itself
  * delivers the partitioning/ordering the sort-merge join needs. At
  * cluster scale this converts the biggest recurring shuffle (trajectory
  * frame joined to per-trajectory metadata, lineitem to orders, candidate
  * pairs to documents) into a map-side merge.
  *
  * Spark requires the metastore path (`saveAsTable`) for bucket metadata;
  * plain `.parquet(path)` writes lose it. */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int): Unit =
    df.write.bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .mode("overwrite").format("parquet").saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertable co-location property. */
  def isExchangeFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange")
  }
}
