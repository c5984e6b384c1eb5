package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Global ordered row index WITHOUT the single-partition window trap: a
  * bare `row_number() OVER (ORDER BY ...)` funnels the entire corpus
  * through ONE task — the classic 100 TB plan killer. This decomposition
  * keeps every stage parallel:
  *
  *   1. range-repartition on the sort key (sampled boundaries, the same
  *      machinery as a distributed sort),
  *   2. sort within partitions,
  *   3. per-partition row counts -> driver prefix sums (one tiny action
  *      over nPartitions longs),
  *   4. zipWithIndex-style local index + broadcast offsets.
  *
  * The index equals the rank of the row in the total (sortCols) order —
  * verified against the SQL row_number twin. Ties MUST be broken by the
  * caller's sort columns (include a unique key last). */
object GlobalIndex {

  def withGlobalIndex(df: DataFrame, indexCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    // materialize the sorted layout once: the count pass and the index
    // pass must see the SAME partitions (and at scale you persist before
    // any double-pass anyway)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val schema = sorted.schema
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex((i, it) =>
      Iterator.single((i, it.size)), preservesPartitioning = true).collect()
      .sortBy(_._1).map(_._2.toLong)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val indexed = rdd.mapPartitionsWithIndex { (i, it) =>
      var k = bc.value(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
    }
    spark.createDataFrame(indexed,
      schema.add(indexCol, org.apache.spark.sql.types.LongType, nullable = false))
  }
}
