package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo A/B harness for the MiniBatchKMeans transport dispatch
  * (VERDICT r14 task 5): runs the q51 fit twice in one JVM — forced
  * DISTRIBUTED (localThreshold = 0, the r14 one-job-per-batch shape,
  * modulo the hash-membership change) and the default size-dispatched
  * LOCAL chain — counting scheduler jobs and wall time for each. The
  * sequential batch chain is the job-count driver: each distributed
  * batch is one cluster-wide job whose useful work is tiny at sf0.1.
  *
  * Run: sbt "runMain graft.tools.MiniBatchBench [sfDir]"
  */
object MiniBatchBench {

  private class JobCounter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onJobStart(
        e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
  }

  /** Battery-embeddable run: the transport A/B on the sf corpus, one
    * JSON line at the end. Wired into AuditBattery (VERDICT r15 task 6,
    * the OrderStatsBench precedent) so a scheduling regression in the
    * sequential-chain paths — a dispatch bound drifting, a per-batch job
    * growing extra stages — lands in every round's ledger instead of
    * merging silently. Trend numbers, not a gate: wall times need canary
    * normalization on this box; the job COUNTS are load-bearing. */
  def run(spark: SparkSession, sfDir: String): Unit = {
    val traj = graft.core.Trajectories.fromEvents(spark, sfDir)
      .localCheckpoint() // shared input, out of both timings

    def once(threshold: Long): (Int, Double) = {
      val c = new JobCounter
      spark.sparkContext.addSparkListener(c)
      // remove the listener even if fit throws: run() is embedded in
      // AuditBattery's long-lived JVM, and a leaked JobCounter would
      // double-count jobs in every later listener-based audit
      val (model, sec) = try {
        val t0 = System.nanoTime()
        val m = graft.clustering.MiniBatchKMeans.fit(traj, k = 4,
          batchFraction = 0.2, maxEpochs = 3, seed = 42L,
          localThreshold = threshold)
        (m, (System.nanoTime() - t0) / 1e9)
      } finally {
        org.apache.spark.sql.GraftExpressionBridge
          .drainListenerBus(spark.sparkContext)
        spark.sparkContext.removeSparkListener(c)
      }
      require(model.k == 4 && model.centers.flatten.forall(v =>
        !v.isNaN && !v.isInfinite))
      (c.jobs.get(), sec)
    }

    // distributed first so its jobs cannot warm the local path's cache
    val (jd, td) = once(0L)
    val (jl, tl) = once(graft.clustering.MiniBatchKMeans.LocalBatchThreshold)
    graft.util.Materialize.unfreeze(traj)
    println(f"""{"bench":"minibatch_ab","dist_jobs":$jd,"dist_s":$td%.2f,""" +
      f""""local_jobs":$jl,"local_s":$tl%.2f}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir)
    spark.stop()
  }
}
