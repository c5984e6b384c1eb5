package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted plans of representative hot-path queries so
  * pushdown / codegen / shuffle structure can be reviewed. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val which = sys.env.getOrElse("AUDIT", "q05")
    val df = graft.SparkEntry.queries(which)(spark, dir)
    println(s"==== $which ====")
    df.explain("formatted")
    spark.stop()
  }
}
