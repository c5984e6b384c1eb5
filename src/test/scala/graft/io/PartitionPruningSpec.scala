package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.matchers.should.Matchers

/** Hive-style partition layout (write.partitionBy) — the coarse analog
  * of bucketing for the 100 TB read path: a filter on the partition
  * column must prune at PLANNING time (directory listing), so a
  * source- or date-sliced query never touches the other slices' files.
  * Asserted on the physical scan's selected partition count, not just
  * row counts. */
class PartitionPruningSpec extends SparkSpec with Matchers {

  test("partition-column filter prunes the scan to one directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (0 until 300).map(i => (i.toLong, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
    df.write.partitionBy("source").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir).where(col("source") === "src1")
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case s: FileSourceScanExec => s }
    val plan = read.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = scans(plan).head
    // partition pruning is visible as the scan's selected-partition count
    scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .length shouldBe 1
    read.count() shouldBe 100L
    // unfiltered control: all three partition directories selected
    val all = spark.read.parquet(dir)
    val allScan = scans(all.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).head
    allScan.relation.location.listFiles(Nil, Nil).length shouldBe 3
  }
}
