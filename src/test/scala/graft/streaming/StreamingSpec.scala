package graft.streaming

import graft.SparkSpec
import graft.agg.Covariance
import graft.lag.Lag
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Streaming partial_fit + lag pairing (SURVEY §2.9; reference
  * RunningCovar semantics: incremental result == batch result). */
class StreamingSpec extends SparkSpec with Matchers {

  def trajDf(n: Int, seed: Long) = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(seed)
    (0 until n).map { i =>
      (i.toLong % 4, (i / 4).toLong, Seq(rng.nextGaussian(), rng.nextGaussian()))
    }.toDF("traj_id", "t", "features")
  }

  test("RunningCovar over batches equals one-shot covariance") {
    val full = trajDf(2000, 3L).cache()
    val pairs = Lag.pairs(full, 1).cache()
    val oneShot = Covariance.fit(pairs)

    val rc = new Streaming.RunningCovar()
    // split into 4 chunks by traj (pairs never cross trajectories)
    (0 until 4).foreach { k =>
      rc.partialFit(pairs.where(col("traj_id") === k).select(col("x"), col("y")))
    }
    val streamed = rc.model
    streamed.count shouldBe oneShot.count
    streamed.weight shouldBe oneShot.weight +- 1e-9
    (0 until streamed.d * streamed.d).foreach { i =>
      streamed.cov00(i) shouldBe oneShot.cov00(i) +- 1e-9
      streamed.cov0t(i) shouldBe oneShot.cov0t(i) +- 1e-9
    }
    (0 until streamed.d).foreach { i =>
      streamed.mean0(i) shouldBe oneShot.mean0(i) +- 1e-12
    }
  }

  test("watermarked windowed counts finalize exactly once in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Int)]
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val counts = Streaming.windowedStateCounts(
      input.toDF().toDF("ts", "state"), "ts", "state",
      windowDur = "10 seconds", delay = "5 seconds")
    val query = counts.writeStream.format("memory")
      .queryName("win_sink").outputMode("append").start()
    try {
      // window [0,10): states 1,1,2 ; window [10,20): state 3
      input.addData((ts(1), 1), (ts(3), 1), (ts(9), 2), (ts(12), 3))
      query.processAllAvailable()
      // advance the watermark past 10+5 so [0,10) finalizes
      input.addData((ts(21), 4))
      query.processAllAvailable()
      val done = spark.table("win_sink")
        .select(col("win_start").cast("long"), col("state"), col("cnt"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      done shouldBe Set((0L, 1, 2L), (0L, 2, 1L)) // only the finalized window
      // a late row for [0,10) beyond the watermark is DROPPED
      input.addData((ts(2), 1))
      query.processAllAvailable()
      spark.table("win_sink").count() shouldBe 2
    } finally { query.stop() }
  }

  test("session windows merge gap-bounded events and finalize exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val sessions = Streaming.sessionWindowCounts(
      input.toDF().toDF("ts", "user_id"), "ts", "user_id",
      gap = "10 seconds", delay = "5 seconds")
    val query = sessions.writeStream.format("memory")
      .queryName("sess_sink").outputMode("append").start()
    try {
      // user 1: events at 0,5,8 chain into one session [0, 18); a later
      // event at 40 is a separate session
      input.addData((ts(0), 1L), (ts(5), 1L), (ts(8), 1L), (ts(40), 1L))
      query.processAllAvailable()
      // watermark must pass 18 + 5 for the first session to finalize
      input.addData((ts(60), 2L))
      query.processAllAvailable()
      val done = spark.table("sess_sink")
        .select(col("user_id"), col("sess_start").cast("long"),
          col("sess_end").cast("long"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // watermark = 60 - 5 = 55 finalizes BOTH user-1 sessions
      // ([0,18) and [40,50)); user 2's own session stays open
      done shouldBe Set((1L, 0L, 18L, 3L), (1L, 40L, 50L, 1L))
    } finally { query.stop() }
  }

  test("streaming dedup keeps exactly the first occurrence per fingerprint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = Streaming.streamingDedup(
      input.toDF().toDF("doc_id", "text"))
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_sink").outputMode("append").start()
    try {
      // duplicates within AND across micro-batches; whitespace/case
      // variants collapse to the same fingerprint
      input.addData((1L, "alpha beta"), (2L, "gamma"), (3L, "alpha beta"))
      query.processAllAvailable()
      input.addData((4L, "  Alpha   BETA "), (5L, "delta"))
      query.processAllAvailable()
      val out = spark.table("dedup_sink").select("doc_id").as[Long].collect().sorted
      out shouldBe Array(1L, 2L, 5L)
    } finally { query.stop() }
  }

  test("streaming reservoir equals the batch ES selection across any batch cuts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 120L).map(i => (i, 10L + (i * 53L) % 300L))
    val withKeys = rows.toDF("doc_id", "n_chars")
      .withColumn("rkey", graft.text.Packing.reservoirKey(col("doc_id"), col("n_chars")))
    val batchTop = graft.text.Packing.weightedReservoir(
        rows.toDF("doc_id", "n_chars"), k = 15).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keyed = withKeys.as[(Long, Long, Long)].collect()
    val input = MemoryStream[(Long, Long, Long)]
    val res = Streaming.streamingReservoir(
      input.toDF().toDF("doc_id", "n_chars", "rkey"), k = 15, shards = 3)
    val query = res.writeStream.format("memory")
      .queryName("res_sink").outputMode("update").start()
    try {
      // adversarial cuts: reversed order, uneven chunks
      keyed.sortBy(-_._1).grouped(37).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      val latest = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("seen").desc)
      val streamTop = spark.table("res_sink")
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(latest))
        .where(col("rn") === 1)
        .select(explode(arrays_zip(col("rkeys"), col("ids"), col("weights"))).as("t"))
        .select(col("t.ids"), col("t.weights"), col("t.rkeys"))
        .orderBy(col("rkeys").desc, col("ids")).limit(15).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      streamTop.toSeq shouldBe batchTop.toSeq
    } finally { query.stop() }
  }

  test("watermarked stream-stream interval join equals the batch pair set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // event times in micros, well inside one watermark delay; window 50us
    val clicks = (0 until 60).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(300).toLong))
    val purchases = (100 until 140).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(300).toLong))
    val expected = (for {
      (ce, cu, ct) <- clicks; (pe, pu, pt) <- purchases
      if cu == pu && pt > ct && pt <= ct + 50
    } yield (ce, pe)).toSet
    val memC = MemoryStream[(Long, Long, Long)]
    val memP = MemoryStream[(Long, Long, Long)]
    val joined = Streaming.streamingIntervalJoin(
      memC.toDF().toDF("event_id", "user_id", "tsu"),
      memP.toDF().toDF("event_id", "user_id", "tsu"), windowMicros = 50L)
    val q = joined.writeStream.format("memory")
      .queryName("ivj_sink").outputMode("append").start()
    try {
      // event-time-ordered thirds, so pairs span micro-batch boundaries
      (0 until 3).foreach { k =>
        val (lo, hi) = (k * 100L, (k + 1) * 100L)
        val cc = clicks.filter(c => c._3 >= lo && c._3 < hi)
        val pp = purchases.filter(p => p._3 >= lo && p._3 < hi)
        if (cc.nonEmpty) memC.addData(cc: _*)
        if (pp.nonEmpty) memP.addData(pp: _*)
        q.processAllAvailable()
      }
      val got = spark.table("ivj_sink")
        .select("click_event_id", "purchase_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe expected
    } finally q.stop()
  }

  test("streaming near-dup candidates equal the batch minhash candidates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // synthetic corpus with planted near-dup families: each family shares
    // a long common text with tiny per-member edits; unrelated docs are
    // distinct word streams
    def familyText(f: Int, member: Int): String = {
      val base = (0 until 40).map(w => s"f${f}w$w").mkString(" ")
      base + s" tail$member"
    }
    def loner(i: Int): String = (0 until 40).map(w => s"solo${i}x$w").mkString(" ")
    val docs: Seq[(Long, String)] =
      (0 until 4).flatMap(f => (0 until 3).map(m =>
        ((f * 3 + m).toLong, familyText(f, m)))) ++
        (12 until 20).map(i => (i.toLong, loner(i)))

    val input = MemoryStream[(Long, String)]
    val cand = Streaming.streamingNearDupCandidates(
      input.toDF().toDF("doc_id", "text"))
    val query = cand.writeStream.format("memory")
      .queryName("neardup_sink").outputMode("append").start()
    try {
      // feed in doc_id order across THREE micro-batches (stored members
      // then have smaller ids, matching the batch a < b normalization)
      input.addData(docs.take(7))
      query.processAllAvailable()
      input.addData(docs.slice(7, 14))
      query.processAllAvailable()
      input.addData(docs.drop(14))
      query.processAllAvailable()
      val streamed = spark.table("neardup_sink").select("a", "b")
        .as[(Long, Long)].collect().toSet
      val batch = graft.dedup.Dedup.minhashCandidates(
        docs.toDF("doc_id", "text"), bands = 8, rowsPerBand = 5)
        .as[(Long, Long)].collect().toSet
      streamed shouldBe batch
      // the planted families must be found
      (0 until 4).foreach { f =>
        val ids = (0 until 3).map(m => (f * 3 + m).toLong)
        for (a <- ids; b <- ids if a < b) streamed should contain((a, b))
      }
    } finally { query.stop() }
  }

  test("streaming lag pairs equal batch lag pairs (MemoryStream end-to-end)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (0L until 3L).flatMap { id =>
      (0L until 50L).map(t => (id, t, Seq(id.toDouble + t, t * 0.5)))
    }
    val mem = MemoryStream[(Long, Long, Seq[Double])]
    val stream = mem.toDF().toDF("traj_id", "t", "features")
    val pairs = Streaming.lagPairsStream(stream, tau = 2)
    val query = pairs.writeStream.format("memory")
      .queryName("pairs_out").outputMode("append").start()
    // feed in two chunks to exercise cross-batch state
    mem.addData(data.filter(_._2 < 20): _*)
    query.processAllAvailable()
    mem.addData(data.filter(_._2 >= 20): _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("pairs_out")
      .select("traj_id", "t", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3))).toSet
    val batch = Lag.pairs(data.toDF("traj_id", "t", "features"), 2)
      .select(col("traj_id"), col("t"), col("x"), col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2), r.getSeq[Double](3))).toSet
    streamed shouldBe batch
    batch.size shouldBe 3 * 48
  }


  test("streaming rolling features equal the batch window on random data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new java.util.SplittableRandom(29L)
    // 4 users x 40 events, distinct times per user, random values
    val data = (0L until 4L).flatMap { u =>
      (0L until 40L).map(t => (u * 100 + t, u, t * 3 + u, rng.nextDouble()))
    }.sortBy(r => (r._3, r._1)) // event-time order across users
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val stream = mem.toDF().toDF("event_id", "user_id", "t", "value")
    val feats = Streaming.rollingFeaturesStream(stream, 5)
    val query = feats.writeStream.format("memory")
      .queryName("roll_out").outputMode("append").start()
    // three chunks cutting through every user's history
    data.grouped(55).foreach { chunk =>
      mem.addData(chunk: _*)
      query.processAllAvailable()
    }
    query.stop()
    val streamed = spark.table("roll_out")
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("trail_avg"), 9).as("ta"), col("trail_max"),
        col("prev_value"), col("n_trail")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5), r.getLong(6))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val trail = w.rowsBetween(-5, -1)
    val batch = data.toDF("event_id", "user_id", "t", "value")
      .select(col("event_id"), col("user_id"), col("value"),
        round(avg(col("value")).over(trail), 9).as("ta"),
        max(col("value")).over(trail).as("trail_max"),
        lag(col("value"), 1).over(w).as("prev_value"),
        count(lit(1)).over(trail).cast("long").as("n_trail")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5), r.getLong(6))).toSet
    streamed shouldBe batch
    batch.size shouldBe 4 * 40
  }

  test("streaming count matrix (update mode) equals batch sliding counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(5)
    val data = (0L until 4L).flatMap { id =>
      (0L until 60L).map(t => (id, t, rng.nextInt(5)))
    }
    val mem = MemoryStream[(Long, Long, Int)]
    val stream = mem.toDF().toDF("traj_id", "t", "state")
    val counts = Streaming.streamingCountMatrix(stream, tau = 1)
    val query = counts.writeStream.format("memory")
      .queryName("counts_out").outputMode("complete").start()
    mem.addData(data.filter(_._2 < 25): _*)
    query.processAllAvailable()
    mem.addData(data.filter(_._2 >= 25): _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("counts_out").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = graft.markov.TransitionCounting.slidingCounts(
        data.toDF("traj_id", "t", "state"), 1).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    streamed shouldBe batch
  }

  test("model persistence: java roundtrip and json roundtrip") {
    val traj = trajDf(500, 7L)
    val model = graft.decomposition.Tica.fit(traj, tau = 1)
    val dir = Files_tmp()
    // java serialization
    Persist.save(model, s"$dir/tica.bin")
    val loaded = Persist.load[graft.decomposition.KoopmanModel](s"$dir/tica.bin")
    loaded.u.toSeq shouldBe model.u.toSeq
    loaded.singularValues.toSeq shouldBe model.singularValues.toSeq
    // json
    Persist.saveJson(Persist.koopmanToJson(model), s"$dir/tica.json")
    val fromJson = Persist.koopmanFromJson(Persist.loadJson(s"$dir/tica.json"))
    fromJson.tau shouldBe model.tau
    fromJson.d shouldBe model.d
    fromJson.u.zip(model.u).foreach { case (a, b) => a shouldBe b +- 1e-12 }
    // cluster model json
    val cm = graft.clustering.ClusterModel(Array(Array(1.0, 2.0), Array(3.0, 4.0)))
    val cm2 = Persist.clusterFromJson(Persist.clusterToJson(cm))
    cm2.centers.map(_.toSeq).toSeq shouldBe cm.centers.map(_.toSeq).toSeq
  }

  private def Files_tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-persist").toString
  private val Persist = graft.io.Persistence
}
