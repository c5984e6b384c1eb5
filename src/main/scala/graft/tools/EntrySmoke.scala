package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: executes SparkEntry.entry exactly as the driver's
  * smoke-check does (rows > 0) and prints a sample + the physical plan. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    df.explain("formatted")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
