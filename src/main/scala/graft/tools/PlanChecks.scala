package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 plan-shape assertions for the documented scale claims:
  * q107 (WindowGroupLimit pushdown bounds the pre-shuffle exchange),
  * q114 (ONE exchange serves both window frames), q109 (hash equi-join,
  * no nested loop), q108 (single exchange, no join operator). Fails loud
  * on any mismatch so a Spark upgrade that silently changes a plan gets
  * caught. */
object PlanChecks {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = 0
    def check(name: String)(assertions: (String, String => Boolean)*): Unit = {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assertions.foreach { case (desc, p) =>
        val ok = p(plan)
        if (!ok) failed += 1
        println(s"[plan] $name :: $desc -> ${if (ok) "OK" else "FAIL"}")
      }
    }
    check("q107_source_quality_cap")(
      ("WindowGroupLimit pushdown present", _.contains("WindowGroupLimit")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q114_rolling_features")(
      ("exactly one exchange (shared by both frames)",
        p => "Exchange".r.findAllIn(p).length == 1),
      ("single Window covers all frames or reuses the partitioning",
        p => !p.contains("Exchange hashpartitioning") ||
          "Exchange hashpartitioning".r.findAllIn(p).length == 1))
    check("q109_range_join")(
      ("no BroadcastNestedLoopJoin", !_.contains("BroadcastNestedLoopJoin")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q108_asof_join")(
      ("no join operator at all", p => !p.contains("Join")))
    check("q121_asof_forward")(
      ("no join operator at all", p => !p.contains("Join")))
    check("q117_tfidf_topk")(
      ("WindowGroupLimit pushdown present", _.contains("WindowGroupLimit")),
      ("df table broadcast, not shuffled", _.contains("BroadcastHashJoin")))
    check("q124_inverted_index")(
      ("WindowGroupLimit pushdown present", _.contains("WindowGroupLimit")))
    check("q119_embedding_outliers")(
      ("WindowGroupLimit pushdown present", _.contains("WindowGroupLimit")),
      ("centroid broadcast, not shuffled", _.contains("BroadcastHashJoin")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q182_sql_q3")(
      ("dim side broadcast", _.contains("BroadcastHashJoin")),
      ("mktsegment filter pushed to the customer scan",
        _.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q183_sql_q5")(
      ("dims broadcast", p => "BroadcastHashJoin".r.findAllIn(p).length >= 3),
      ("region filter pushed to the region scan",
        _.contains("EqualTo(r_name,ASIA)")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q201_random_projection")(
      ("no exchange at all — projection stays at the scan",
        p => !p.contains("Exchange")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q213_knn_classify")(
      ("probe slice broadcast (bounded nested loop by construction)",
        _.contains("BroadcastNestedLoop")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q215_runtime_filter")(
      ("runtime bloom filter injected into the fact scan",
        _.contains("might_contain")),
      ("shuffle join path exercised", p =>
        p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")))
    check("q214_partition_pruning")(
      ("day filter reaches the scan as a partition filter",
        p => p.contains("PartitionFilters") && p.contains("day#") &&
          p.contains("19725")),
      ("no cartesian", !_.contains("CartesianProduct")))
    check("q245_tram_overlap")(
      ("overlap self-join is a hash equi-join on the markov state", p =>
        p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
          p.contains("BroadcastHashJoin")),
      ("no cartesian", !_.contains("CartesianProduct")),
      ("no nested loop", !_.contains("BroadcastNestedLoop")))
    // q165's registered query returns the battery frame, so audit the
    // ANN plan itself: the shortlist rank filter must push map-side
    locally {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.where(org.apache.spark.sql.functions.col("vec_id") % 40 === 0)
      val plan = graft.similarity.Similarity.pqTopK(emb, q, k = 5, dim = 64,
        m = 8, ksub = 64, shortlist = 48, seed = 42L)
        .queryExecution.executedPlan.toString
      val ok1 = plan.contains("WindowGroupLimit")
      val ok2 = !plan.contains("CartesianProduct")
      if (!ok1 || !ok2) failed += 1
      println(s"[plan] q165 pqTopK :: WindowGroupLimit=${ok1} noCartesian=${ok2} " +
        s"-> ${if (ok1 && ok2) "OK" else "FAIL"}")
    }
    if (failed > 0) { println(s"[plan] $failed FAILED"); sys.exit(1) }
    println("[plan] ALL PLAN CLAIMS HOLD")
    spark.stop()
  }
}
