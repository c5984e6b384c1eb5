package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** State-store growth regression (VERDICT r09 item 6): the streaming
  * family's state contracts — O(shards·k) reservoir, O(windows) HLL,
  * watermark-TTL'd dedup — were asserted by construction; this spec
  * reads the REAL `StreamingQueryProgress.stateOperators` row counts
  * across micro-batches and fails if state grows with stream length.
  * Each scenario feeds batches whose cumulative input grows linearly
  * while the pinned state bound is constant (or watermark-bounded). */
class StateGrowthSpec extends SparkSpec with Matchers {

  /** Feed chunks through a fresh 4-partition session; returns the
    * state-operator total row count observed after each chunk.
    * `rocksdb = true` swaps the state backend for the
    * RocksDBStateStoreProvider (what a real 100 TB/day cluster runs —
    * state spills off-heap/disk instead of living on the JVM heap);
    * the contract numbers must be backend-independent. */
  private def stateRowsPerBatch[T](chunks: Seq[Seq[T]], rocksdb: Boolean = false,
      outputMode: String = "update")(
      build: (org.apache.spark.sql.SparkSession, MemoryStream[T]) => DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Seq[Long] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 4)
    if (rocksdb) s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[T]
    val out = build(s, mem)
    val sink = "sg_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query: StreamingQuery = out.writeStream.format("memory")
      .queryName(sink).outputMode(outputMode).start()
    try {
      chunks.map { chunk =>
        mem.addData(chunk: _*)
        query.processAllAvailable()
        // most recent progress that actually processed rows carries the
        // state numbers for the chunk's batch
        val p = query.recentProgress.reverse
          .find(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
          .orElse(query.recentProgress.reverse.find(_.stateOperators.nonEmpty))
        p.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      }
    } finally query.stop()
  }

  test("streaming reservoir state is O(shards), flat while input grows 8x") {
    import spark.implicits._
    // 8 batches x 2000 rows, all distinct ids — cumulative input grows
    // 8x; per-shard top-k state must stay at exactly `shards` rows
    val chunks = (0 until 8).map(b =>
      (0 until 2000).map(i => (b * 2000L + i, 100L + i % 37)))
    val rows = stateRowsPerBatch(chunks) { (s, mem) =>
      graft.streaming.Streaming.streamingReservoir(
        mem.toDF().toDF("doc_id", "n_chars").withColumn("rkey",
          graft.text.Packing.reservoirKey(col("doc_id"), col("n_chars"))),
        k = 20, shards = 4)
    }
    rows.last should be > 0L // non-vacuous: progress genuinely carried state
    rows.last should be <= 4L
    // flat: state after batch 2 == state after batch 8
    rows.drop(1).distinct.length shouldBe 1
  }

  test("windowed HLL state is O(windows), flat while input grows 6x") {
    import spark.implicits._
    val dayUs = 86400000000L
    val base = 1000000000000000L
    // 6 batches, every batch re-hits the SAME 3 day-windows with 3000
    // fresh user ids — distinct-user state would grow linearly; the HLL
    // sketch per window must not
    val chunks = (0 until 6).map(b =>
      (0 until 3000).map { i =>
        val day = i % 3
        (b * 10000L + i, base + day * dayUs + (i % 1000) * 1000000L)
      })
    val rows = stateRowsPerBatch(chunks) { (s, mem) =>
      graft.streaming.Streaming.windowedDistinct(
        mem.toDF().toDF("user_id", "tsu")
          .withColumn("ts", timestamp_micros(col("tsu"))),
        "ts", "user_id", "1 day", "0 seconds", rsd = 0.02)
    }
    // one aggregation row per open window (3 real windows; allow the
    // implementation a small constant factor, not growth)
    rows.last should be > 0L // non-vacuous: progress genuinely carried state
    rows.last should be <= 12L
    rows.drop(1).distinct.length shouldBe 1
  }

  test("watermark-TTL dedup state expires: bounded by the horizon, not the stream") {
    import spark.implicits._
    val base = 1000000000000000L
    val batchSpanUs = 4000L * 1000000L // 4000 s per batch
    // 6 batches x 1000 ALL-DISTINCT texts, event time advancing 4000 s
    // per batch against a 2000 s watermark delay: without expiry the
    // dedup state would hold all 6000 fingerprints; with
    // dropDuplicatesWithinWatermark it must shed everything older than
    // the horizon
    val chunks = (0 until 6).map(b =>
      (0 until 1000).map { i =>
        val id = b * 1000L + i
        (id, base + b * batchSpanUs + i * 1000000L, s"unique document text $id payload")
      })
    val rows = stateRowsPerBatch(chunks) { (s, mem) =>
      graft.streaming.Streaming.streamingDedup(
        mem.toDF().toDF("doc_id", "tsu", "text")
          .withColumn("ts", timestamp_micros(col("tsu")))
          .withWatermark("ts", "2000 seconds"),
        withinWatermark = true)
    }
    // steady state: roughly one batch's keys within the horizon; must
    // never approach the 6000-key full history
    rows.last should be < 3000L
    rows.last should be > 0L
    // flat-ish: the last three batches see the same bounded state size
    rows.takeRight(3).max - rows.takeRight(3).min should be <= 1000L
    // and explicitly NOT monotone growth to the full stream size
    rows.max should be < 6000L
  }

  test("RocksDB state backend: identical state contract to the default " +
    "HDFS backend (watermark-TTL dedup)") {
    import spark.implicits._
    val base = 1000000000000000L
    val batchSpanUs = 4000L * 1000000L
    val chunks = (0 until 5).map(b =>
      (0 until 800).map { i =>
        val id = b * 800L + i
        (id, base + b * batchSpanUs + i * 1000000L, s"unique document text $id payload")
      })
    def run(rocksdb: Boolean): Seq[Long] =
      stateRowsPerBatch(chunks, rocksdb = rocksdb) { (s, mem) =>
        graft.streaming.Streaming.streamingDedup(
          mem.toDF().toDF("doc_id", "tsu", "text")
            .withColumn("ts", timestamp_micros(col("tsu")))
            .withWatermark("ts", "2000 seconds"),
          withinWatermark = true)
      }
    val hdfs = run(rocksdb = false)
    val rocks = run(rocksdb = true)
    // the state CONTRACT (row counts per batch after watermark expiry)
    // is a property of the operator, not the storage backend — a real
    // cluster running RocksDB must see the same bounded curve the
    // default-backend specs above pin
    rocks shouldBe hdfs
    rocks.last should be > 0L
    rocks.max should be < 4000L
  }

  test("streaming near-dup LSH bucket state is capped: rows pinned at the " +
    "bucket count while members grow 6x past the cap") {
    import spark.implicits._
    // every doc is the SAME text (identical minhash signature -> the
    // same `bands` buckets) with a distinct id: 6 x 1000 arrivals pile
    // members onto a CONSTANT bucket set. With maxStoredPerBucket = 8,
    // stored membership stops at 8 per bucket; the state ROW count (one
    // row per bucket key) must stay pinned at the band count while
    // cumulative input grows 6x — unbounded member storage would not
    // change the row count but WOULD change emitted-pair growth, so
    // both are asserted (late arrivals emit at most cap pairs each).
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val chunks = (0 until 6).map(b =>
      (0 until 1000).map(i => (b * 1000L + i, text)))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", 4)
    implicit val sqlCtx = s2.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.Streaming.streamingNearDupCandidates(
      mem.toDF().toDF("doc_id", "text"), bands = 8, rowsPerBand = 5,
      maxStoredPerBucket = 8)
    val sink = "sg_nd_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk: _*)
        query.processAllAvailable()
        val p = query.recentProgress.reverse
          .find(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
          .orElse(query.recentProgress.reverse.find(_.stateOperators.nonEmpty))
        stateRows += p.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
        emitted += s2.table(sink).count()
      }
    } finally query.stop()
    stateRows.last should be > 0L
    // identical signatures -> at most `bands` bucket keys, forever
    stateRows.foreach(_ should be <= 8L)
    stateRows.drop(1).distinct.length shouldBe 1
    // emission growth is LINEAR at <= bands * cap pairs per arrival
    // (each arrival pairs with at most the 8 stored members per bucket),
    // NOT quadratic: batch 6's increment must match batch 2's
    val increments = emitted.sliding(2).map(w => w(1) - w(0)).toSeq
    increments.last shouldBe increments.head +- (increments.head / 10)
  }

  test("RocksDB state backend: streaming reservoir O(shards) contract holds") {
    import spark.implicits._
    val chunks = (0 until 5).map(b =>
      (0 until 1500).map(i => (b * 1500L + i, 100L + i % 37)))
    val rows = stateRowsPerBatch(chunks, rocksdb = true) { (s, mem) =>
      graft.streaming.Streaming.streamingReservoir(
        mem.toDF().toDF("doc_id", "n_chars").withColumn("rkey",
          graft.text.Packing.reservoirKey(col("doc_id"), col("n_chars"))),
        k = 20, shards = 4)
    }
    rows.last should be > 0L
    rows.last should be <= 4L
    rows.drop(1).distinct.length shouldBe 1
  }
}
