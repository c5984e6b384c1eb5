package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The reliable-checkpoint switch (spark.graft.reliableCheckpoint): the
  * cluster-durability path must yield frames IDENTICAL to the default
  * localCheckpoint path — Materialize.frozen is the single choke point
  * every frozenness-critical site (GlobalIndex two-pass, Dedup SNM rank,
  * CC/PageRank rounds, QShared memoization) routes through. */
class MaterializeSpec extends SparkSpec with Matchers {

  private def withReliable[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    spark.conf.set(Materialize.ReliableConfKey, "true")
    sc.setCheckpointDir(dir.toString)
    try body
    finally spark.conf.set(Materialize.ReliableConfKey, "false")
  }

  test("frozen yields the same rows on both paths and cuts lineage") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, (i * 31 % 97).toLong))
      .toDF("id", "v").repartition(5)
    val local = Materialize.frozen(df).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val reliable = withReliable {
      val f = Materialize.frozen(df)
      // reliable checkpoint truncates the logical lineage too
      f.queryExecution.analyzed.collectLeaves() should not be empty
      f.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    reliable shouldBe local
  }

  test("reliable flag without a checkpoint dir fails loud") {
    // a fresh session shares the context; simulate no-dir by clearing is
    // not possible on a shared sc, so only assert when unset so far
    if (sc.getCheckpointDir.isEmpty) {
      spark.conf.set(Materialize.ReliableConfKey, "true")
      try {
        import spark.implicits._
        val e = intercept[IllegalArgumentException] {
          Materialize.frozen(Seq((1L, 2L)).toDF("a", "b"))
        }
        e.getMessage should include(Materialize.ReliableConfKey)
      } finally spark.conf.set(Materialize.ReliableConfKey, "false")
    }
  }

  test("GlobalIndex two-pass decomposition is identical under the reliable path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 3000).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(500).toLong + 1))
      .toDF("id", "key", "v").repartition(6)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "r").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
        .sortBy(_._1).toSeq
    val plain = canon(graft.operators.GlobalIndex.withRunning(
      df, "r", "v", "sum", "range_excl",
      Seq(col("key"), col("id")), rangeKey = Some("key")))
    val rel = withReliable {
      canon(graft.operators.GlobalIndex.withRunning(
        df, "r", "v", "sum", "range_excl",
        Seq(col("key"), col("id")), rangeKey = Some("key")))
    }
    rel shouldBe plain
  }

  test("GlobalIndex Auto dispatch leaves NO cache entries behind " +
    "(the r12 accumulation regression guard)") {
    import spark.implicits._
    val before = spark.sharedState.cacheManager.isEmpty
    val df = (0 until 500).map(i => (i.toLong, (i * 7 % 50).toLong))
      .toDF("id", "v").repartition(3)
    // unknown count -> the dispatch runs its count; neither branch may
    // cache (the r12.0 shape cached+froze per call: three nested calls
    // accumulated three cached plans per bench invocation)
    val a = graft.operators.GlobalIndex.withNtile(df, "t", 4, Seq(col("v"), col("id")))
    val b = graft.operators.GlobalIndex.withRunningAuto(a, "r", "v",
      agg = "sum", frame = "rows_incl", sortCols = Seq(col("v"), col("id")))
    b.count()
    if (before) assert(spark.sharedState.cacheManager.isEmpty,
      "Auto dispatch left cached plans in the shared cacheManager")
  }

  test("range_excl rejects sort orders that do not lead with the rangeKey") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("id", "key", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.GlobalIndex.withRunning(df, "r", "v", "sum", "range_excl",
        Seq(col("id"), col("key")), rangeKey = Some("key"))
    }
    e.getMessage should include("rangeKey")
  }

  test("unfreeze releases frozen blocks — including a frame's INNER frozen " +
    "layout behind internalCreateDataFrame — and leaves user caches alone") {
    import spark.implicits._
    def ckptIds: Set[Int] = sc.getPersistentRDDs.collect {
      case (id, r) if r.isCheckpointed => id
    }.toSet
    val pre = ckptIds
    // a directly frozen frame: its LogicalRDD leaf is the persisted RDD
    val base = Materialize.frozen(
      (0 until 2000).map(i => (i.toLong, (i * 31 % 97).toLong)).toDF("id", "v"))
    // a frame BUILT ON frozen layouts: withGlobalIndex freezes its sorted
    // layout internally; the returned plan's leaf is a NEW un-persisted
    // RDD whose PARENT is the frozen one (the leak ADVICE r15 flagged)
    val indexed = graft.operators.GlobalIndex.withGlobalIndex(
      base, "gi", col("v"), col("id"))
    indexed.count()
    val during = ckptIds -- pre
    assert(during.size >= 2, s"expected base + inner sorted layout " +
      s"checkpointed, saw ids $during")
    // a plain user cache must survive unfreeze untouched
    val cached = base.select((col("v") * 2).as("w")).cache()
    cached.count()
    Materialize.unfreeze(indexed)
    Materialize.unfreeze(base)
    val after = ckptIds -- pre
    assert(after.isEmpty, s"unfreeze left frozen blocks behind: ids $after")
    assert(sc.getPersistentRDDs.values.exists(r => !r.isCheckpointed),
      "user .cache() should not be touched by unfreeze")
    cached.unpersist()
  }

  test("pin: a shared (memoized) frozen frame survives a consumer's " +
    "unfreeze and stays consumable — the 47-failure r17 draft regression") {
    import spark.implicits._
    def ckptIds: Set[Int] = sc.getPersistentRDDs.collect {
      case (id, r) if r.isCheckpointed => id
    }.toSet
    val pre = ckptIds
    // the QShared.memoFrame shape: one frozen frame handed to MANY queries
    val shared = Materialize.pin(Materialize.frozen(
      (0 until 2000).map(i => (i.toLong, (i * 13 % 89).toLong)).toDF("id", "v")))
    // query A consumes it through its own frozen derivative, then the
    // harness unfreezes A's full lineage
    val qa = Materialize.frozen(shared.groupBy("v").count())
    qa.count()
    Materialize.unfreeze(qa)
    // A's own frozen frame is released, the pinned shared frame is not
    val left = ckptIds -- pre
    assert(left.nonEmpty, "pinned shared frame must keep its blocks")
    // query B (and a memo RETRY, the failure mode) still reads real blocks
    shared.groupBy(col("v") % 7).count().count() shouldBe 7L
    Materialize.unfreeze(shared) // pinned: explicit unfreeze is also a no-op
    shared.count() shouldBe 2000L
  }
}
