package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.agg.{CovarianceModel, LagRow, MomentsAggregator, MomentsBuf}

/** Streaming estimation surface (SURVEY §2.9; reference
  * covariance/util/_running_moments.py `RunningCovar.add` /
  * `Covariance.partial_fit`).
  *
  * Two shapes:
  *  - `RunningCovar`: an online accumulator whose `partialFit` folds ANY
  *    batch DataFrame into O(d^2) driver state via the same
  *    partial/merge contract the batch aggregator uses — so streaming
  *    foreachBatch, micro-batch loops, and incremental re-estimation all
  *    share one code path with identical numerics (Kahan-compensated).
  *  - `lagPairsStream`: per-trajectory lag pairing on an unbounded stream
  *    via flatMapGroupsWithState — each key holds only the last `tau`
  *    frames (bounded state), emitting (x, y) pairs as frames arrive. */
object Streaming {

  /** Online covariance with the reference's partial_fit contract. */
  class RunningCovar(bessel: Boolean = true) extends Serializable {
    private val agg = new MomentsAggregator(bessel)
    private var buf: MomentsBuf = MomentsBuf.empty

    /** Fold one batch (columns x, y array<double>, optional w) into state.
      * Empty batches (incl. zero-partition frames) are a no-op. */
    def partialFit(batch: DataFrame, weightCol: Option[String] = None): this.type = synchronized {
      if (batch.isEmpty) return this
      val spark = batch.sparkSession
      import spark.implicits._
      val wcol = weightCol.map(col).getOrElse(lit(1.0))
      val ds = batch.select(
        col("x").cast("array<double>").as("x"),
        col("y").cast("array<double>").as("y"),
        wcol.cast("double").as("w")).as[LagRow]
      // run the distributed partial aggregation for the batch, then merge
      // the single batch buffer into the driver state
      val batchBuf = ds.mapPartitions { it =>
        val b = MomentsBuf.empty
        it.foreach(r => b.add(r.x, r.y, r.w))
        Iterator.single(b)
      }.reduce { (a, b) => a.mergeIn(b); a }
      buf.mergeIn(batchBuf)
      this
    }

    /** Current model snapshot (cheap; does not consume state). */
    def model: CovarianceModel = agg.finish(copyBuf())

    private def copyBuf(): MomentsBuf = {
      val c = MomentsBuf.empty
      c.mergeIn(buf)
      c
    }

    def count: Long = buf.n
  }

  /** Bounded per-key state for streaming lag pairing over any payload. */
  case class LagState[V](times: List[Long], vals: List[V])

  /** The one streaming lag-buffer state machine, shared by the feature and
    * discrete-state pairings: rows arrive IN ORDER per trajectory (the
    * usual Kafka-partitioned-by-key contract), state per key holds `tau`
    * frames, and each arrival beyond that emits the pair for the frame
    * `tau` steps back. */
  private def lagBuffered[V](trajId: Long, rows: Iterator[(Long, Long, V)],
                             state: GroupState[LagState[V]],
                             tau: Int): Iterator[(Long, Long, V, V)] = {
    val prev = state.getOption.getOrElse(LagState[V](Nil, Nil))
    var times = prev.times
    var vals = prev.vals
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, V, V)]
    rows.toSeq.sortBy(_._2).foreach { case (_, t, x) =>
      times = times :+ t
      vals = vals :+ x
      if (times.length > tau) {
        out += ((trajId, times.head, vals.head, x))
        times = times.tail
        vals = vals.tail
      }
    }
    state.update(LagState(times, vals))
    out.iterator
  }

  /** Emit (traj_id, t, x, y=x_{t+tau}) feature pairs from an unbounded
    * stream of (traj_id, t, features) rows. */
  def lagPairsStream(stream: DataFrame, tau: Int): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("traj_id").cast("long"), col("t").cast("long"),
        col("features").cast("array<double>"))
      .as[(Long, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LagState[Seq[Double]], (Long, Long, Seq[Double], Seq[Double])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (trajId, rows, state) => lagBuffered(trajId, rows, state, tau)
      }
      .toDF("traj_id", "t", "x", "y")
  }

  /** Emit (traj_id, t, s0, s1=s_{t+tau}) transition pairs from an
    * unbounded dtraj stream (same contract/state machine as
    * lagPairsStream). Blank states (-1) still occupy a time slot — pairs
    * touching them are dropped downstream exactly like the batch path. */
  def lagStatePairsStream(stream: DataFrame, tau: Int): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("traj_id").cast("long"), col("t").cast("long"),
        col("state").cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LagState[Int], (Long, Long, Int, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (trajId, rows, state) => lagBuffered(trajId, rows, state, tau)
      }
      .toDF("traj_id", "t", "s0", "s1")
  }

  /** Streaming transition-count matrix: the state-pair stream into an
    * UPDATE-mode groupBy count — a genuine streaming aggregation whose
    * state is bounded by n^2 keys regardless of stream length, so it runs
    * forever at any rate. Collecting the update-mode sink (or reading the
    * state store) yields the live count matrix for online MSM refresh. */
  def streamingCountMatrix(stream: DataFrame, tau: Int): DataFrame =
    lagStatePairsStream(stream, tau)
      .where(col("s0") >= 0 && col("s1") >= 0)
      .groupBy("s0", "s1")
      .agg(count(lit(1)).as("cnt"))

  /** Watermarked event-time windowed aggregation over a trajectory/event
    * stream (SURVEY §2.9 "watermarks + windowed aggs"): tumbling windows
    * of `windowDur` over the event-time column, state bounded by the
    * watermark `delay` — late data beyond it is dropped and windows
    * finalize, so APPEND mode emits each window exactly once. The
    * streaming analog of the q14 histogram / q07 state-count family. */
  def windowedStateCounts(stream: DataFrame, tsCol: String, stateCol: String,
                          windowDur: String, delay: String): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur), col(stateCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col(stateCol), col("cnt"))

  /** Watermarked windowed approx-distinct (streaming HLL++): per tumbling
    * `windowDur` window, the approximate distinct count of `keyCol` —
    * the streaming twin of the q90 sketch family. The per-window state is
    * ONE mergeable HLL sketch (2^p registers) instead of a distinct-key
    * set, so state size is O(windows x 2^p) regardless of stream rate —
    * the only windowed-distinct shape that survives an unbounded
    * high-cardinality stream. Append mode emits each window exactly once
    * at watermark passage. */
  def windowedDistinct(stream: DataFrame, tsCol: String, keyCol: String,
                       windowDur: String, delay: String,
                       rsd: Double = 0.02): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(approx_count_distinct(col(keyCol), rsd).as("est"))
      .select(col("window.start").as("win_start"), col("est"))

  /** Stream-static enrichment join + windowed rollup: each stream row
    * joins the (small, broadcastable) static dimension on `keyCol`, then
    * tumbling `windowDur` windows count rows per `dimCol` value — the
    * canonical "enrich the event stream with a profile table" shape.
    * The static side is re-resolved per micro-batch (so a dim refresh is
    * picked up) and broadcast; stream state is the windowed agg only,
    * bounded by the watermark. Append mode emits each (window, dim)
    * exactly once. */
  def streamStaticWindowedCounts(stream: DataFrame, statics: DataFrame,
                                 tsCol: String, keyCol: String,
                                 dimCol: String, windowDur: String,
                                 delay: String): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .join(broadcast(statics), Seq(keyCol))
      .groupBy(window(col(tsCol), windowDur), col(dimCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(dimCol), col("n"))

  /** Streaming sessionization (the streaming twin of
    * `Trajectories.sessionize`): Structured Streaming's `session_window`
    * merges events into gap-bounded sessions per user; with a watermark,
    * sessions finalize once the gap cannot be bridged by late data, so
    * append mode emits each session exactly once. */
  def sessionWindowCounts(stream: DataFrame, tsCol: String, userCol: String,
                          gap: String, delay: String): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))

  /** Streaming exact dedup for a document stream: fingerprint each doc
    * (md5 of whitespace-normalized lowercased text, the same key as the
    * batch `Dedup` path) and keep only the FIRST occurrence via
    * `dropDuplicates` over the fingerprint — Structured Streaming's
    * state-store dedup, the exactly-once ingest gate a training-data
    * pipeline puts in front of its corpus.
    *
    * State contract: one state-store entry per distinct fingerprint.
    * Without a watermark the state grows with the distinct-doc count —
    * bounded by corpus cardinality, the same budget a batch dedup needs,
    * but resident. With `withinWatermark=true` (requires `withWatermark`
    * upstream) Spark's `dropDuplicatesWithinWatermark` expires fingerprint
    * state once it can no longer collide — the dedup KEY stays the
    * fingerprint alone, so identical docs at different event times are
    * still deduplicated while their state windows overlap (widening the
    * key with the time column would silently stop deduplicating at all). */
  def streamingDedup(stream: DataFrame, textCol: String = "text",
                     withinWatermark: Boolean = false): DataFrame = {
    val fp = graft.text.TextFunctions.fingerprint(col(textCol))
    val withFp = stream.withColumn("fp", fp)
    if (withinWatermark) withFp.dropDuplicatesWithinWatermark("fp")
    else withFp.dropDuplicates("fp")
  }

  /** Per-user state for streaming rolling features: the trailing
    * `window` values, oldest first. */
  case class RollState(vals: List[Double])

  /** Streaming rolling per-entity features — the stateful twin of the
    * batch q114 window: per user, each event emits the STRICTLY-PRIOR
    * trailing-`window` average/max, the lag-1 value, and the trailing
    * count, then folds its own value into the state. Rows arrive in
    * event-time order per user (the Kafka-partitioned-by-key contract;
    * within a micro-batch they are sorted by (t, event_id)); state is
    * O(window) doubles per user — the online feature-store shape that
    * serves point-in-time-correct features at ingest time instead of
    * recomputing the batch window. The trailing sum folds oldest-first,
    * matching the batch window frame's accumulation order, so values are
    * bit-identical to the batch path. */
  def rollingFeaturesStream(stream: DataFrame, window: Int = 5): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("t").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[RollState,
        (Long, Long, Double, Option[Double], Option[Double], Option[Double], Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (user, rows, state) =>
          var vals = state.getOption.map(_.vals).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Double, Option[Double], Option[Double], Option[Double], Long)]
          rows.toSeq.sortBy(r => (r._3, r._1)).foreach { case (eid, _, _, v) =>
            val n = vals.length
            val avg = if (n == 0) None else Some(vals.sum / n)
            val mx = if (n == 0) None else Some(vals.max)
            out += ((eid, user, v, avg, mx, vals.lastOption, n.toLong))
            vals = (vals :+ v).takeRight(window)
          }
          state.update(RollState(vals))
          out.iterator
        }
      .toDF("event_id", "user_id", "value", "trail_avg", "trail_max",
        "prev_value", "n_trail")
  }

  /** Watermarked stream-stream interval join: clicks x purchases of the
    * same user with the purchase inside (click, click + windowMicros]
    * — the attribution-join shape (conversion within the attribution
    * window) as a REAL stream-stream inner join. Both sides carry
    * event-time watermarks and the join condition bounds the time range
    * in BOTH directions, so Spark can size and expire the join state
    * (an unbounded-range stream-stream join would hold every row
    * forever — the state-blowup trap this operator's contract avoids).
    * Inputs carry `tsu` (micros since epoch, long); event-time columns
    * are derived as real timestamps for the watermark machinery.
    *
    * `joinType = "leftOuter"` adds the attribution-funnel complement:
    * clicks with NO purchase in the window surface with null purchase
    * columns — but only AFTER the watermark passes the click's window
    * (the state store must prove no match can still arrive), so an
    * outer-join harness must push the watermark past its data to flush
    * the unmatched tail. */
  def streamingIntervalJoin(clicks: DataFrame, purchases: DataFrame,
                            windowMicros: Long,
                            delayThreshold: String = "10 minutes",
                            joinType: String = "inner"): DataFrame = {
    val c = clicks
      .withColumn("c_ts", timestamp_micros(col("tsu")))
      .withWatermark("c_ts", delayThreshold)
      .select(col("event_id").as("click_event_id"),
        col("user_id"), col("tsu").as("c_tsu"), col("c_ts"))
    val p = purchases
      .withColumn("p_ts", timestamp_micros(col("tsu")))
      .withWatermark("p_ts", delayThreshold)
      .select(col("event_id").as("purchase_event_id"),
        col("user_id").as("p_user_id"), col("tsu").as("p_tsu"), col("p_ts"))
    // the range predicate is on the WATERMARKED event-time columns, so
    // the state store can expire rows outside the window on both sides
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowMicros MICROSECOND"),
        joinType)
      .select(col("click_event_id"), col("user_id"),
        col("c_tsu").as("t_click"), col("purchase_event_id"),
        col("p_tsu").as("t_purchase"))
  }

  /** Per-shard state for the streaming weighted reservoir: the current
    * top-`k` (rkey, id, weight) triples plus a seen-counter that lets a
    * sink reader pick each shard's LATEST update-mode emission. */
  case class ReservoirState(top: List[(Long, Long, Long)], seen: Long)

  /** Streaming weighted-reservoir sampling: the stateful twin of the
    * batch Efraimidis–Spirakis top-k (Packing.weightedReservoir). Input
    * rows carry a precomputed integer ES key (`rkey`); each shard
    * (id mod `shards`) folds arrivals into O(k) state — insert, sort by
    * (key desc, id), truncate — and emits its running top-k in update
    * mode with the seen-count, so the final sample is the k best of the
    * shards' latest emissions. The ES key is a pure function of
    * (id, weight), so the streaming sample is IDENTICAL to the batch
    * selection whatever the arrival order or micro-batch boundaries —
    * the property that makes reservoir sampling the streaming-ingest
    * sampler (one pass, bounded memory, no reprocessing). */
  def streamingReservoir(stream: DataFrame, k: Int, shards: Int = 4): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("doc_id").cast("long"), col("n_chars").cast("long"),
        col("rkey").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1 % shards)
      .mapGroupsWithState[ReservoirState, (Long, Long, Seq[Long], Seq[Long], Seq[Long])](
        GroupStateTimeout.NoTimeout()) { (shard, rows, state) =>
          val st = state.getOption.getOrElse(ReservoirState(Nil, 0L))
          var top = st.top
          var seen = st.seen
          rows.foreach { case (id, w, key) =>
            seen += 1
            top = ((key, id, w) :: top)
              .sortBy { case (ky, id2, _) => (-ky, id2) }.take(k)
          }
          state.update(ReservoirState(top, seen))
          (shard, seen, top.map(_._1), top.map(_._2), top.map(_._3))
        }
      .toDF("shard", "seen", "rkeys", "ids", "weights")
  }

  /** Per-bucket state for streaming LSH near-dup candidates: the first
    * `maxStored` doc ids seen in the (band, band_hash) bucket. */
  case class BucketState(members: List[Long])

  private def bucketCandidates(rows: Iterator[(Int, Long, Long)],
                               state: GroupState[BucketState],
                               maxStored: Int): Iterator[(Long, Long)] = {
    var members = state.getOption.map(_.members).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    rows.toSeq.sortBy(_._3).foreach { case (_, _, id) =>
      if (!members.contains(id)) {
        members.foreach(m => out += ((math.min(m, id), math.max(m, id))))
        if (members.length < maxStored) members = members :+ id
      }
    }
    state.update(BucketState(members))
    out.iterator
  }

  /** Streaming NEAR-dup candidates: incremental minhash-LSH over an
    * unbounded document stream — each arriving doc is banded with the
    * SAME signature/banding expressions as the batch
    * `Dedup.minhashCandidates`, and per (band, band_hash) bucket the
    * stateful operator emits a candidate pair against every stored
    * member. The streaming twin of fuzzy corpus dedup: an ingest
    * pipeline flags near-duplicates of everything seen so far without
    * re-scanning the corpus.
    *
    * State contract: at most `maxStoredPerBucket` doc ids per bucket
    * (first arrivals). Under-cap buckets reproduce the batch all-pairs
    * candidates exactly (StreamingSpec gates set equality); over-cap
    * arrivals still pair with every STORED member but are not stored —
    * candidate growth stays LINEAR in bucket size, the streaming
    * analogue of the batch hub fallback (batch hubs are the smallest
    * ids; streaming hubs are the earliest arrivals — both arbitrary-but-
    * deterministic representatives for downstream connected components).
    * A pair colliding in several bands (or re-sent docs) can emit more
    * than once — dedup downstream exactly like the batch `.distinct()`. */
  def streamingNearDupCandidates(stream: DataFrame, textCol: String = "text",
                                 idCol: String = "doc_id",
                                 shingleLen: Int = 5, bands: Int = 8,
                                 rowsPerBand: Int = 5,
                                 maxStoredPerBucket: Int = 64): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val capped = maxStoredPerBucket
    graft.dedup.Dedup.lshBands(stream, textCol, idCol, shingleLen, bands, rowsPerBand)
      .select(col("band_idx").cast("int"), col("band_hash").cast("long"),
        col(idCol).cast("long"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BucketState, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long)], state: GroupState[BucketState]) =>
          bucketCandidates(rows, state, capped)
      }
      .toDF("a", "b")
  }

  /** Wire a streaming trajectory source into an online covariance: pairs
    * via `lagPairsStream`, folded per micro-batch through
    * `RunningCovar.partialFit` (the foreachBatch shape). Returns the query
    * and the live accumulator. */
  def streamingLaggedCovariance(stream: DataFrame, tau: Int,
                                bessel: Boolean = true,
                                checkpointDir: String): (org.apache.spark.sql.streaming.StreamingQuery, RunningCovar) = {
    val rc = new RunningCovar(bessel)
    val pairs = lagPairsStream(stream, tau)
    val query = pairs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) rc.partialFit(batch.select(col("x"), col("y")))
        ()
      }
      .start()
    (query, rc)
  }
}
