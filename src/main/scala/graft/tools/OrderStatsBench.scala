package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Solo before/after harness for the GlobalIndex Tungsten-path rewrite
  * (VERDICT r13 task 1): times each order-statistics operator END TO END
  * (construct — which freezes the sorted layout — plus one full
  * consumption of the emitted frame) on a 6M-row x 12-column frame.
  * Wide rows on purpose: the GenericRow tax the rewrite removes is
  * per-FIELD boxing (`r.toSeq :+ v` allocated a 13-element Seq plus a
  * box per numeric field per row), so narrow audit rows understate it.
  * Median of 3 reps per operator, one JSON line at the end.
  *
  * Run: sbt "runMain graft.tools.OrderStatsBench"
  */
object OrderStatsBench {

  def wideCorpus(spark: SparkSession, n: Long): DataFrame = {
    val p = 4999999L // coprime to 6e6: value is a bijective permutation
    spark.range(n).select(
      col("id"),
      pmod(col("id") * p, lit(n)).as("value"),
      (pmod(col("id") * p, lit(n)) / 10L).cast("long").as("tie10"),
      lit(1L).as("one"),
      (col("id") % 97).as("c1"), (col("id") % 89).as("c2"),
      (col("id") * 31 % 83).as("c3"),
      (col("id") % 1000 / 7.0).as("d1"), (col("id") % 500 * 1.5).as("d2"),
      (col("id") % 250 + 0.25).as("d3"),
      concat(lit("doc-"), col("id") % 10000).as("s1"),
      concat(lit("shard-"), col("id") % 64).as("s2"))
  }

  def timeOp(reps: Int)(build: => DataFrame): Double = {
    val secs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val df = build // freezes the sorted layout eagerly inside
      df.queryExecution.toRdd.count() // consume the emit pass
      val t = (System.nanoTime() - t0) / 1e9
      // release the frozen layout NOW (outside the timing): embedded in
      // AuditBattery's single JVM, 9 leaked 6M x 12 localCheckpoint
      // frames otherwise pile onto the driver heap until GC runs
      graft.util.Materialize.unfreeze(df)
      t
    }
    secs.sorted.apply(reps / 2)
  }

  /** Battery-embeddable run: times the three Tungsten-path passes on the
    * wide frame and prints the one-line JSON record. Wired into
    * AuditBattery (VERDICT r14 task 7) so the order-statistics constant
    * factor lands in every round's ledger and a GenericRow-style
    * regression cannot merge silently; medians are comparable round over
    * round on the same box (canary-normalize before judging drift). */
  def run(spark: SparkSession, n: Long, reps: Int = 3): Unit = {
    val base = graft.util.Materialize.frozen(wideCorpus(spark, n))
    base.queryExecution.toRdd.count() // warm the input out of the timings
    import graft.operators.GlobalIndex
    val tIndex = timeOp(reps)(
      GlobalIndex.withGlobalIndex(base, "gi", col("value")))
    val tRows = timeOp(reps)(GlobalIndex.withRunning(
      base, "cum", "one", agg = "sum", frame = "rows_excl",
      sortCols = Seq(col("value"))))
    val tRange = timeOp(reps)(GlobalIndex.withRunning(
      base, "cumlt", "one", agg = "sum", frame = "range_excl",
      sortCols = Seq(col("tie10"), col("id")), rangeKey = Some("tie10")))
    graft.util.Materialize.unfreeze(base)
    println(f"""{"bench":"orderstats_solo","rows":$n,"cols":12,""" +
      f""""global_index_s":$tIndex%.2f,"rows_excl_s":$tRows%.2f,""" +
      f""""range_excl_s":$tRange%.2f}""")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sys.env.getOrElse("ORD_ROWS", "6000000").toLong)
    spark.stop()
  }
}
