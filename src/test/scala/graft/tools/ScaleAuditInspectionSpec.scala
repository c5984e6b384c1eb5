package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Pins the audit plan inspections against the Spark 4.1 AQE trap: a
  * POST-execution adaptive plan is a single ResultQueryStageExec leaf,
  * so any TreeNode-collect-based assertion silently matches nothing.
  * Round 9 found every prior payload/cartesian/exchange check had been
  * passing vacuously that way; these tests fail loudly if a Spark
  * upgrade (or a refactor) ever re-hides the stage subtrees from
  * `ScaleAudit.allPlanNodes`. Each case EXECUTES the plan first —
  * the audits inspect what actually ran, which is exactly the shape
  * that regressed. */
class ScaleAuditInspectionSpec extends SparkSpec with Matchers {

  test("exchangeMaxima sees the shuffle of an EXECUTED adaptive plan") {
    val df = spark.range(100000).withColumn("k", col("id") % 97)
      .groupBy("k").count()
    df.queryExecution.toRdd.count()
    val (maxRec, _, nEx) = ScaleAudit.exchangeMaxima(df)
    nEx should be >= 1
    // partial aggregation: at most partitions * keys records through the
    // exchange, and at least the 97 distinct keys
    maxRec should be >= 97L
  }

  test("shuffledPayloadColumns catches a text column crossing an " +
    "executed shuffle, and clears when only ids cross") {
    import spark.implicits._
    val docs = (1 to 500).map(i => (i.toLong, "payload text " * 3)).toDF("doc_id", "text")
    val shuffled = docs.repartition(4, col("doc_id"))
      .groupBy("doc_id").agg(first("text").as("text"))
    shuffled.queryExecution.toRdd.count()
    ScaleAudit.shuffledPayloadColumns(shuffled) should contain("text")

    val idsOnly = docs.select("doc_id").repartition(4, col("doc_id"))
      .groupBy("doc_id").count()
    idsOnly.queryExecution.toRdd.count()
    ScaleAudit.shuffledPayloadColumns(idsOnly) shouldBe empty
  }

  test("inspections see through a persisted stage (cache-scan leaf)") {
    // the 100x audits persist() each stage so one execution serves both
    // the audit and downstream consumers — the real plan then hides
    // behind an InMemoryTableScanExec leaf
    val df = spark.range(50000).withColumn("k", col("id") % 53)
      .groupBy("k").count().persist()
    try {
      df.queryExecution.toRdd.count()
      val (_, _, nEx) = ScaleAudit.exchangeMaxima(df)
      nEx should be >= 1
    } finally df.unpersist()
  }

  test("hasCartesian flags an executed cross join and clears an equi-join") {
    import spark.implicits._
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    // tiny relations otherwise plan as a broadcast nested loop; the
    // hint forces the CartesianProductExec shape the audit looks for
    val cross = a.hint("shuffle_replicate_nl").crossJoin(b)
    cross.queryExecution.toRdd.count()
    ScaleAudit.hasCartesian(cross) shouldBe true
    val equi = a.join(b.withColumnRenamed("y", "x"), "x")
    equi.queryExecution.toRdd.count()
    ScaleAudit.hasCartesian(equi) shouldBe false
  }
}
