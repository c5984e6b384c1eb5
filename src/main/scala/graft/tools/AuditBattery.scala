package graft.tools

import org.apache.spark.sql.SparkSession

/** Headless CI entry point for the scale-audit battery (VERDICT r10
  * item 6): the named 100x audits were a manual `main` with env vars,
  * and PlanChecksSpec proved that promoting plan claims into a runnable
  * gate catches rot. This runs the full 10x battery plus one or more
  * 100x families in ONE JVM, exits nonzero on any invariant failure
  * (loud), and writes the per-stage exchange tables it printed to a
  * committed ledger file — so the round's BASELINE.md entry is generated
  * from audit output, never hand-copied.
  *
  * Usage:
  *   sbt "runMain graft.tools.AuditBattery"             # 10x + rotation pick
  *   sbt "runMain graft.tools.AuditBattery asof100 moments100"  # explicit
  *   GRAFT_ROUND=12 sbt "runMain graft.tools.AuditBattery"      # rotation by round
  *
  * The rotation family is families100(GRAFT_ROUND mod |families100|)
  * when GRAFT_ROUND is set; without it the battery runs the 10x suite
  * only (explicit args always win). Ledger: tools/ledger/audit_r<N>.md
  * (or audit_latest.md without GRAFT_ROUND) — commit it with the round.
  */
object AuditBattery {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SCALE_SRC", "/root/testdata/sf0.1")
    val out10 = sys.env.getOrElse("SCALE_DIR", "/tmp/graft_sf1")
    val out100 = sys.env.getOrElse("SCALE_DIR_100", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val round = sys.env.get("GRAFT_ROUND").flatMap(_.toIntOption)
    val families: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else round.map(r =>
        Seq(ScaleAudit.families100(r % ScaleAudit.families100.size))).getOrElse(Seq.empty)

    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // tee stdout: everything the audits print lands in the ledger too
    val buf = new java.io.ByteArrayOutputStream()
    val realOut = System.out
    val tee = new java.io.PrintStream(new java.io.OutputStream {
      override def write(b: Int): Unit = { realOut.write(b); buf.write(b) }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        realOut.write(b, off, len); buf.write(b, off, len)
      }
      override def flush(): Unit = realOut.flush()
    }, true)

    var failures = 0
    Console.withOut(tee) {
      println(s"[audit-battery] 10x battery + 100x families: " +
        s"${if (families.isEmpty) "(none)" else families.mkString(", ")}" +
        round.map(r => s"  [round $r rotation]").getOrElse(""))
      // the full 22-family battery accumulates localCheckpoint blocks
      // across families in ONE JVM; an 8g driver heap OOM'd in the late
      // families (r15) where the documented 48g runs clean — surface the
      // heap early instead of dying 20 minutes in
      val maxGb = Runtime.getRuntime.maxMemory / (1 << 30)
      println(s"[audit-battery] driver heap: ${maxGb} GiB" +
        (if (families.size > 3 && maxGb < 16)
          "  WARNING: multi-family batteries are validated at 48g " +
            "(SPARK_DRIVER_MEM=48g) — low heaps have OOM'd in late families"
         else ""))
      // per-family heap attribution (VERDICT r16 task 4): the low-heap
      // warning above warns but records nothing — print each family's
      // peak driver heap (JMX pool high-water, reset per family) so the
      // localCheckpoint-accumulation class has a trend line in the
      // ledger like the orderstats tripwire got. Soft band: any single
      // family peaking above ~0.75x of max heap is the OOM precursor the
      // r15 failures showed; documented in BASELINE.md (trend check, not
      // a gate — corpus sizes differ per family by design).
      def heapLine(tag: String): Unit = {
        println(s"[audit-battery] heap[$tag]: peak " +
          s"${graft.util.HeapStat.fmt(graft.util.HeapStat.peakGiB)} GiB, " +
          s"settled ${graft.util.HeapStat.fmt(graft.util.HeapStat.usedGiB)} GiB")
        graft.util.HeapStat.resetPeak()
      }
      graft.util.HeapStat.resetPeak()
      failures += ScaleAudit.run10x(spark, src, out10)
      heapLine("10x")
      // per-round order-statistics constant-factor tripwire (VERDICT r14
      // task 7): the OrderStatsBench medians are recorded in every
      // round's ledger so a GenericRow-style regression on the Tungsten
      // passes cannot land silently (trend check, not a gate — absolute
      // numbers need canary normalization on this box). Settle the heap
      // first: the 10x families leave tens of GB of old-gen residue
      // whose collection otherwise lands INSIDE the timed reps (r16:
      // in-battery rows_excl read 15.06 s vs 8.97 s solo at the same
      // binary and drift — a 1.7x phantom the trend check would chase)
      System.gc(); Thread.sleep(2000)
      println("[audit-battery] --- orderstats tripwire ---")
      OrderStatsBench.run(spark, n = 6000000L)
      heapLine("orderstats")
      // per-round sequential-chain transport tripwire (VERDICT r15 task
      // 6): the MiniBatchBench A/B that justified the r15 size dispatch
      // (49 jobs/7.47 s distributed -> 20 jobs/1.43 s local at sf0.1),
      // recorded every round so a scheduling regression in the
      // sequential-chain paths (minibatch, Lloyd, Hmm EM share the
      // dispatch pattern) cannot land silently
      System.gc(); Thread.sleep(2000) // same settle: orderstats frames precede
      println("[audit-battery] --- minibatch transport A/B tripwire ---")
      MiniBatchBench.run(spark, src)
      heapLine("minibatch_ab")
      families.foreach { f =>
        println(s"[audit-battery] --- 100x family: $f ---")
        failures += ScaleAudit.run100x(spark, f, src, out100)
        heapLine(f)
      }
      println(if (failures == 0) "[audit-battery] ALL INVARIANTS HOLD"
              else s"[audit-battery] $failures FAILURES")
    }

    val tag = round.map(r => s"r$r").getOrElse("latest")
    val dir = java.nio.file.Paths.get("tools/ledger")
    java.nio.file.Files.createDirectories(dir)
    val header = s"# Scale-audit battery ledger ($tag)\n\n" +
      s"Generated by `graft.tools.AuditBattery` — 10x battery" +
      (if (families.isEmpty) "" else s" + 100x ${families.mkString(", ")}") +
      s". Verdict: ${if (failures == 0) "ALL INVARIANTS HOLD" else s"$failures FAILURES"}.\n\n```\n"
    java.nio.file.Files.write(dir.resolve(s"audit_$tag.md"),
      (header + buf.toString("UTF-8") + "```\n").getBytes("UTF-8"))
    println(s"[audit-battery] ledger written: tools/ledger/audit_$tag.md")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
