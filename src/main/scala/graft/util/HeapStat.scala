package graft.util

import scala.jdk.CollectionConverters._

/** Driver-heap telemetry for the single-JVM harnesses (Verify, Bench,
  * AuditBattery): the localCheckpoint-accumulation failure class (frozen
  * frames held until the GC ContextCleaner gets to them — observed as
  * 8 GiB-driver OOMs in late audit families, r15) is invisible until it
  * kills the run, so every harness now RECORDS its peak heap instead of
  * hoping. Peak = sum of per-pool JMX peak usage across heap pools —
  * the high-water mark since JVM start (or the last [[resetPeak]]),
  * which survives the GC that a point-in-time `totalMemory - freeMemory`
  * reading misses. The pools peak at DIFFERENT instants (G1 moves
  * regions between eden/survivor/old), so the sum is an UPPER bound on
  * any instantaneous footprint and can exceed -Xmx (observed: 12.35
  * "GiB" on an 8 GiB heap in the sf1.0 sweep) — read it as a trend
  * line, not an absolute occupancy. */
object HeapStat {
  private def heapPools =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)

  /** High-water heap usage in GiB since JVM start or the last reset. */
  def peakGiB: Double =
    heapPools.map(_.getPeakUsage.getUsed).sum.toDouble / (1L << 30)

  /** Current (post-whatever-GC-has-run) heap usage in GiB. */
  def usedGiB: Double =
    heapPools.flatMap(p => Option(p.getUsage)).map(_.getUsed).sum.toDouble /
      (1L << 30)

  /** Reset the per-pool peaks so the next [[peakGiB]] reading is scoped
    * to the work that follows (per-family attribution in AuditBattery). */
  def resetPeak(): Unit = heapPools.foreach(_.resetPeakUsage())

  def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", v)
}
