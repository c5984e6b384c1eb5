package graft.util

import org.apache.spark.SparkContext

/** Scoped Spark job-description tagging for the per-iteration jobs the
  * scheduler-level scale audits key on (cluster100/bayes100/hmm100).
  *
  * `setJobDescription(null)` in a finally block clears whatever
  * description the CALLER had set, so an outer harness tagging its own
  * jobs loses its tag after the first nested fit. This helper saves the
  * caller's description (the `spark.job.description` local property)
  * and restores that exact value — including null when none was set —
  * instead of unconditionally nulling.
  */
object JobTag {
  def withDescription[T](sc: SparkContext, desc: String)(body: => T): T = {
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
