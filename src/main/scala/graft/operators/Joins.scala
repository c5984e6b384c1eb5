package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval join operators Spark lacks natively (the build
  * brief's "compose existing ops if semantics allow" rung — both of
  * these have well-known relational decompositions that scale, so no
  * custom physical operator is warranted).
  *
  * No reference counterpart (deeptime has no join surface); these are
  * the event/feature-alignment primitives a training-data pipeline needs
  * (point-in-time-correct feature lookup, interval enrichment). */
object Joins {

  /** Point-in-time (as-of) join: for every left row, attach the payload
    * of the LATEST right row with the same key and `rightTime` STRICTLY
    * before `leftTime` (nulls when no such row — left-outer semantics).
    *
    * Decomposition: union the two sides with a tag (left = 0, right = 1),
    * one window per key ordered by (time, tag), and carry the last
    * non-null right payload forward. Strictness falls out of the tag
    * order: at equal timestamps the right copy sorts AFTER the left row,
    * so it is not visible to it.
    *
    * Scale shape: ONE hash exchange keyed by `key` (the window) — no
    * join operator at all, no per-row probe, state is a single struct
    * per partition-ordered row. At 100 TB the window sort is the only
    * super-linear term; range-partitioning by (key, time-bucket) with
    * per-bucket seeding is the standard refinement when single keys
    * outgrow a partition.
    *
    * `payload` columns are taken from `right`; they come back prefixed
    * via `as` aliases chosen by the caller (pass a pre-selected right). */
  def asofJoinStrict(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTime)
    unionTagAsof(left, right, key, leftTime, rightTime,
      struct(payloadCols.map(col).toIndexedSeq: _*), descending = false)
  }

  /** Forward (next-event) as-of join: for every left row, attach the
    * payload and time of the EARLIEST right row with the same key and
    * `rightTime` STRICTLY after `leftTime` — the "time-to-next-event"
    * label primitive of a training pipeline (e.g. time-to-next-purchase
    * targets). Same union-tag single-exchange decomposition as
    * `asofJoinStrict`, with the window order REVERSED (time desc): the
    * running last-non-null then carries the nearest strictly-later right
    * row. At equal timestamps the right copy sorts after the left row in
    * the reversed order too, so strictness again falls out of the tag.
    * The matched right time comes back as `__match.__mt` so callers can
    * derive the time-to-next delta. Ties among right rows sharing
    * (key, rightTime) resolve to the greatest payload struct
    * (deterministic, as in `asofJoinStrict`). */
  def asofJoinForwardStrict(left: DataFrame, right: DataFrame, key: String,
                            leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTime)
    unionTagAsof(left, right, key, leftTime, rightTime,
      struct((col(rightTime).as("__mt") +:
        payloadCols.map(col).toIndexedSeq): _*), descending = true)
  }

  /** Nearest as-of join: for every left row, the right row (same key)
    * whose time is CLOSEST by |Δt|, equal timestamps allowed; the tie
    * between an equally-distant earlier and later right row goes to the
    * EARLIER one (the pandas merge_asof direction='nearest' shape).
    * Returns the matched right time as `__match.__mt`.
    *
    * Decomposition: the same single-exchange union-tag frame, with the
    * right rows tagged to sort BEFORE left rows at equal time (so an
    * exact-time match is visible), and TWO running-last window passes
    * over the one exchange — ascending time for the nearest-earlier
    * carry, DESCENDING time for the nearest-later carry — then a pure
    * column pick by absolute distance. Still no join operator, still
    * one hash exchange per key; the second pass costs one extra
    * partition sort, not a shuffle. Both frames are
    * (unboundedPreceding, currentRow) running state: the r10 shape
    * computed the later side as `first(...) over (currentRow,
    * unboundedFollowing)`, which Spark executes as an
    * UnboundedFollowingWindowFunctionFrame that RESCANS the suffix for
    * every row — O(rows²) per partition, a silent hot-key quadratic
    * (surfaced by the asof100 nearest stage under a planted 4M-row key:
    * effectively hung). Right rows sharing (key, time) are
    * indistinguishable in the output because the payload is the matched
    * time itself.
    *
    * Hot-key note: like the plain backward/forward shapes, one key's
    * history sorts in one partition; when that outgrows a task, compose
    * the bucket-seeded decompositions ([[asofJoinStrictSkew]] for the
    * earlier side, [[asofJoinForwardStrictSkew]] for the later side)
    * and pick by |Δt| — the two carries are exactly this operator's
    * `__prev`/`__next`. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String): DataFrame = {
    val pay = struct(col(rightTime).as("__mt"))
    val l = left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(0))
      .withColumn("__pay",
        lit(null).cast(right.select(pay).schema.fields(0).dataType))
    val r0 = right.select(col(key), col(rightTime).as("__t"), pay.as("__pay"))
      .withColumn("__tag", lit(-1)) // before left at equal time: exact matches visible
    val leftCols = left.columns
    val r = leftCols.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__pay"))).toIndexedSeq: _*)
    val unioned = l.select((leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__pay"))).toIndexedSeq: _*)
      .unionByName(r)
    val wPrev = Window.partitionBy(key).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // nearest-later as a running last over the REVERSED sort (equal-time
    // rights sort after left under (t desc, tag desc) too, so they stay
    // excluded from the later side exactly as in the ascending suffix
    // frame this replaces — which was O(rows²) per partition)
    val wNextRev = Window.partitionBy(key)
      .orderBy(col("__t").desc, col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dPrev = col("__t") - col("__prev").getField("__mt")
    val dNext = col("__next").getField("__mt") - col("__t")
    unioned
      .withColumn("__prev", last(col("__pay"), ignoreNulls = true).over(wPrev))
      .withColumn("__next", last(col("__pay"), ignoreNulls = true).over(wNextRev))
      .where(col("__tag") === 0)
      .withColumn("__match",
        when(col("__next").isNull, col("__prev"))
          .when(col("__prev").isNull, col("__next"))
          .when(dPrev <= dNext, col("__prev"))
          .otherwise(col("__next")))
      .drop("__t", "__tag", "__pay", "__prev", "__next")
  }

  /** Shared union-tag as-of core: tag left 0 / right 1, align schemas,
    * ONE per-key window ordered by (time [desc], tag, payload), carry
    * the last non-null payload. The tag order makes equal-timestamp
    * right rows invisible to the left row (strictness) in both
    * directions; the payload sort key makes same-(key, time) right-row
    * ties deterministic (greatest payload struct wins — payload columns
    * must be orderable types, true for the scalar payloads this
    * operator targets). */
  private def unionTagAsof(left: DataFrame, right: DataFrame, key: String,
                           leftTime: String, rightTime: String,
                           pay: Column, descending: Boolean): DataFrame = {
    val l = left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(0))
      .withColumn("__pay",
        lit(null).cast(right.select(pay).schema.fields(0).dataType))
    val r0 = right.select(col(key), col(rightTime).as("__t"), pay.as("__pay"))
      .withColumn("__tag", lit(1))
    // align schemas: right rows carry nulls for left columns
    val leftCols = left.columns
    val r = leftCols.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__pay"))).toIndexedSeq: _*)
    val unioned = l.select((leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__pay"))).toIndexedSeq: _*)
      .unionByName(r)
    val tOrd = if (descending) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(key).orderBy(tOrd, col("__tag"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__tag") === 0)
      .drop("__t", "__tag", "__pay")
  }

  /** Skew-safe as-of join: identical semantics to [[asofJoinStrict]],
    * decomposed so no single key's full history ever has to fit one
    * partition sort — the refinement the plain shape needs at 100 TB
    * when a hot key (a bot user, a null-ish default key) outgrows a
    * partition.
    *
    * Two-pass bucket seeding:
    *   1. the union-tag frame gains `bucket = floor(time / bucketWidth)`
    *      and the running last-non-null payload is computed per
    *      (key, bucket) — partition sorts are bounded by one bucket's
    *      rows regardless of key heat;
    *   2. a (key, bucket)-grained summary table (one aggregate row per
    *      OCCUPIED bucket: the bucket's final right payload, null when
    *      the bucket holds no right rows) is prefix-scanned per key —
    *      `last(_, ignoreNulls)` over buckets strictly before — to
    *      produce each bucket's carry-in, which seeds rows whose local
    *      running value is still null.
    *
    * The ordering inside a bucket equals the global ordering restricted
    * to that bucket and the carry-in is exactly the global running value
    * at the bucket boundary, so the result is row-identical to
    * [[asofJoinStrict]] (spec-pinned, incl. boundary/tie/empty-bucket
    * cases). The carry-in enters as SEED ROWS, not a join: each occupied
    * (key, bucket)'s carry becomes one synthetic row with a null time and
    * tag -2, which sorts FIRST inside its bucket (asc = nulls first, then
    * the tag), so the local running last-non-null picks it up exactly
    * when no in-bucket right row precedes. Two wins over the r09 carry
    * JOIN this replaces: (a) no join operator at all — in particular no
    * forced broadcast of a carry table whose cardinality is
    * data-dependent (one row per (key, occupied bucket) approaches
    * |L|+|R| when keys are numerous and cold — a driver OOM at 100 TB,
    * VERDICT r10 item 1); (b) null KEYS keep the row-identity contract —
    * every grouping here (window partitionBy, groupBy) treats null as an
    * ordinary group, where the replaced equi-join dropped null-key
    * carries silently (ADVICE r10).
    *
    * Cost shape: one (key, bucket) exchange of |L|+|R|+|seeds| rows for
    * the window (seeds <= occupied (key, bucket) pairs — the summary-
    * sized term), one partial-combined bucket-grained aggregate, and one
    * key-grained window over the summary rows. Zero joins, zero
    * broadcasts (asof100 + PlanChecksSpec pin both). */
  def asofJoinStrictSkew(left: DataFrame, right: DataFrame, key: String,
                         leftTime: String, rightTime: String,
                         bucketWidth: Long): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTime)
    asofSkewCore(left, right, key, leftTime, rightTime, bucketWidth,
      struct(payloadCols.map(col).toIndexedSeq: _*), strict = true)
  }

  /** Shared bucket-seeded backward-carry core: `strict = true` gives
    * [[asofJoinStrictSkew]]'s semantics (right rows invisible to an
    * equal-timestamp left row — right tag sorts AFTER left); `strict =
    * false` the non-strict variant (equal-time rights VISIBLE — right
    * tag sorts BEFORE left, the backward half of the nearest
    * composition). The seed tag sorts before both. Strict vs non-strict
    * only reorders rows at EQUAL time, which cannot span buckets, so
    * the carry logic is shared unchanged. */
  private def asofSkewCore(left: DataFrame, right: DataFrame, key: String,
                           leftTime: String, rightTime: String,
                           bucketWidth: Long, pay: Column,
                           strict: Boolean): DataFrame = {
    require(bucketWidth > 0)
    val rightTag = if (strict) 1 else -1
    val payType = right.select(pay).schema.fields(0).dataType
    val l = left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(0))
      .withColumn("__pay", lit(null).cast(payType))
    val r0 = right.select(col(key), col(rightTime).as("__t"), pay.as("__pay"))
      .withColumn("__tag", lit(rightTag))
    val leftCols = left.columns
    def alignLeft(df: DataFrame): DataFrame = leftCols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val r = alignLeft(r0)
      .select((leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__pay"))).toIndexedSeq: _*)
    val unioned = l.select((leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__pay"))).toIndexedSeq: _*)
      .unionByName(r)
      .withColumn("__bk", floor(col("__t") / bucketWidth).cast("long"))
    // carry computation: per-(key, occupied-bucket) final right payload;
    // the max of (t, tag, pay) over the bucket's right rows IS the
    // bucket-final running value (right rows sort after left rows at
    // equal t, ties by greatest pay — the exact order wLocal uses). The
    // groupBy combines map-side, so this exchange ships at most the
    // per-partition distinct (key, bucket) count however hot a key is.
    val finals = unioned
      .groupBy(col(key), col("__bk"))
      .agg(max(when(col("__pay").isNotNull,
        struct(col("__t"), col("__tag"), col("__pay")))).as("__fin"))
    // prefix-scan per key over occupied buckets (summary-sized window):
    // each bucket's carry-in = last non-null bucket-final strictly before
    val wCarry = Window.partitionBy(key).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = alignLeft(finals
      .withColumn("__pay",
        last(col("__fin"), ignoreNulls = true).over(wCarry)
          .getField("__pay"))
      .where(col("__pay").isNotNull)
      .withColumn("__t", lit(null).cast(unioned.schema("__t").dataType))
      .withColumn("__tag", lit(-2)) // before left AND right at any time
      .drop("__fin"))
      .select(unioned.columns.map(col).toIndexedSeq: _*)
    // pass 2: running last within (key, bucket) over real rows + seeds —
    // same (t, tag, pay) order as the global shape restricted to the
    // bucket, with the seed first (null time, tag -2 so it sorts before
    // the non-strict right tag -1 at equal time). Null-TIME real
    // rows land in bucket null, which wCarry's asc-nulls-first order
    // places before every numbered bucket — exactly where the global
    // single-window shape sorts null-time rows.
    val wLocal = Window.partitionBy(key, "__bk")
      .orderBy(col("__t"), col("__tag"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.unionByName(seeds)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(wLocal))
      .where(col("__tag") === 0)
      .drop("__t", "__tag", "__pay", "__bk")
  }

  /** Skew-safe FORWARD as-of join: [[asofJoinForwardStrict]]'s semantics
    * through [[asofJoinStrictSkew]]'s bucket-seeded decomposition, by
    * time-axis negation — strictly-after in t is strictly-before in -t,
    * and the equal-timestamp exclusion carries over unchanged (right
    * rows sort after left rows at equal negated time too). The matched
    * right time comes back as `__match.__mt` like the plain forward
    * variant (payload field order differs, which only affects
    * tie-resolution among right rows sharing (key, time) — where the
    * fields that could differ are compared identically because `__mt`
    * is equal by construction). */
  def asofJoinForwardStrictSkew(left: DataFrame, right: DataFrame, key: String,
                                leftTime: String, rightTime: String,
                                bucketWidth: Long): DataFrame = {
    val ln = left.withColumn("__negt", -col(leftTime))
    val rn = right
      .withColumn("__mt", col(rightTime))
      .withColumn("__negt", -col(rightTime))
      .drop(rightTime)
    asofJoinStrictSkew(ln, rn, key, "__negt", "__negt", bucketWidth)
      .drop("__negt")
  }

  /** Skew-safe NEAREST as-of join: [[asofJoinNearest]]'s semantics (match
    * by min |Δt|, exact times allowed, equal-distance ties to the EARLIER
    * right row) through the bucket-seeded decomposition — the composition
    * [[asofJoinNearest]]'s hot-key note promises: a NON-STRICT backward
    * carry (equal-time rights visible — right tag sorts before left)
    * gives `__prev`, the mirror-image forward carry gives `__next`, and
    * the match is a pure column pick by |Δt|.
    *
    * Fused single-pipeline shape (r15; the r14 shape ran the whole
    * bucket-seeded decomposition TWICE — once per direction, on a
    * frozen row-id'd left — and zipped the halves with an equi-join,
    * 2.6× the plain path in asof100): both directions now share ONE
    * union-tag frame, ONE bucket-grained aggregate (emitting the
    * bucket-FINAL right payload for the backward carry and the
    * bucket-INITIAL right payload for the forward carry), ONE
    * summary-sized per-key carry scan per direction over the same
    * summary exchange, and ONE (key, bucket) data exchange carrying
    * both seed kinds. A seed-band column `__sb` (backward −1, real 0,
    * forward +1) places each seed where its direction's running pass
    * starts and the OTHER direction's pass ends: the ascending `__prev`
    * window orders (`__sb`, t, tag) so backward seeds lead and forward
    * seeds trail (visible to no left row); the descending `__next`
    * window orders (`__sb` desc, t desc, tag) so forward seeds lead —
    * its running last-non-null then carries the nearest strictly-later
    * right payload exactly as the plain shape's reversed window does.
    * Zero joins, zero broadcasts, no row ids, no checkpoint; every task
    * stays bounded by one (key, bucket) slice regardless of key heat.
    *
    * Contract: null KEYS follow the plain operator (one null-key group);
    * rows with null event TIMES are out of contract for this composition
    * (the forward carry cannot mirror the plain operator's nulls-first
    * suffix semantics) — clean them first, as pandas merge_asof
    * requires. Spec pins row-identity to [[asofJoinNearest]] on random +
    * planted-hot-key + null-key data with non-null times, and the
    * randomized stress family compares against a driver brute force. */
  def asofJoinNearestSkew(left: DataFrame, right: DataFrame, key: String,
                          leftTime: String, rightTime: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val pay = struct(col(rightTime).as("__mt"))
    val payType = right.select(pay).schema.fields(0).dataType
    val l = left.withColumn("__t", col(leftTime)).withColumn("__tag", lit(0))
      .withColumn("__pay", lit(null).cast(payType))
    // right tag −1: equal-time rights sort before left rows in BOTH
    // pass orders (tag is ascending in both), so exact-time matches are
    // visible on both sides; the |Δt| pick then resolves them to __prev
    // (dPrev = 0 ≤ dNext), matching the plain operator.
    val r0 = right.select(col(key), col(rightTime).as("__t"), pay.as("__pay"))
      .withColumn("__tag", lit(-1))
    val leftCols = left.columns
    def alignLeft(df: DataFrame): DataFrame = leftCols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val shape = leftCols.map(col) ++ Seq(col("__t"), col("__tag"), col("__pay"))
    val base = l.select(shape.toIndexedSeq: _*)
      .unionByName(alignLeft(r0).select(shape.toIndexedSeq: _*))
      .withColumn("__bk", floor(col("__t") / bucketWidth).cast("long"))
      .withColumn("__sb", lit(0))
    // ONE bucket-grained aggregate feeds BOTH carries (map-side combined;
    // ships at most the per-partition distinct (key, bucket) count):
    // __finB = the bucket's LAST right payload in ascending (t, tag, pay)
    // order (the backward running value at the bucket's end); __finF =
    // the bucket's FIRST right payload — max over the negated time axis —
    // (the forward running value at the bucket's start).
    val finals = base.groupBy(col(key), col("__bk")).agg(
      max(when(col("__pay").isNotNull,
        struct(col("__t"), col("__tag"), col("__pay")))).as("__finB"),
      max(when(col("__pay").isNotNull,
        struct((-col("__t")).as("__negt"), col("__tag"), col("__pay"))))
        .as("__finF"))
    // per-key carry scans over occupied buckets (summary-sized; same
    // partitioning → one exchange, two sorts): each bucket's backward
    // carry-in is the last non-null bucket-final strictly BEFORE it,
    // its forward carry-in the last non-null bucket-initial strictly
    // AFTER it (a prefix scan on the reversed bucket order).
    val wB = Window.partitionBy(key).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wF = Window.partitionBy(key).orderBy(col("__bk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = finals
      .withColumn("__cB",
        last(col("__finB"), ignoreNulls = true).over(wB).getField("__pay"))
      .withColumn("__cF",
        last(col("__finF"), ignoreNulls = true).over(wF).getField("__pay"))
    // ONE seeds branch for both directions: each occupied (key, bucket)
    // explodes into ≤ 2 seed rows — the backward carry at band −1, the
    // forward carry at band +1 — so the summary pipeline (union scan →
    // bucket aggregate → carry scans) executes ONCE. Two per-direction
    // branches would each prune the other's carry column and re-execute
    // the whole summary subtree (no exchange reuse once the plans
    // diverge) — measured ~1.4× on the asof100 hot-key frame.
    val seeds = alignLeft(carried
      .select(col(key), col("__bk"), explode(array(
        struct(lit(-1).as("__sb"), col("__cB").as("__pay")),
        struct(lit(1).as("__sb"), col("__cF").as("__pay")))).as("__s"))
      .where(col("__s").getField("__pay").isNotNull)
      .select(col(key), col("__bk"),
        col("__s").getField("__sb").as("__sb"),
        col("__s").getField("__pay").as("__pay"))
      .withColumn("__t", lit(null).cast(base.schema("__t").dataType))
      .withColumn("__tag", lit(-2)))
      .select(base.columns.map(col).toIndexedSeq: _*)
    // ONE (key, bucket) data exchange, two window sorts over it. Within
    // real rows (__sb = 0) the ascending order is exactly the plain
    // nearest operator's (t, tag, pay) restricted to the bucket, and the
    // descending order its reversed (t desc, tag, pay) — so each local
    // running value, seeded with the carry at the bucket boundary,
    // equals the global one.
    val wPrev = Window.partitionBy(key, "__bk")
      .orderBy(col("__sb"), col("__t"), col("__tag"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(key, "__bk")
      .orderBy(col("__sb").desc, col("__t").desc, col("__tag"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lt = col(leftTime)
    val dPrev = lt - col("__prev").getField("__mt")
    val dNext = col("__next").getField("__mt") - lt
    base.unionByName(seeds)
      .withColumn("__prev", last(col("__pay"), ignoreNulls = true).over(wPrev))
      .withColumn("__next", last(col("__pay"), ignoreNulls = true).over(wNext))
      .where(col("__tag") === 0)
      .withColumn("__match",
        when(col("__next").isNull, col("__prev"))
          .when(col("__prev").isNull, col("__next"))
          .when(dPrev <= dNext, col("__prev"))
          .otherwise(col("__next")))
      .drop("__t", "__tag", "__pay", "__bk", "__sb", "__prev", "__next")
  }

  /** Interval (range) join: pair every point row with every interval row
    * whose [lo, hi] contains the point, without a nested-loop join.
    *
    * Decomposition: quantize the value axis into `bucketWidth`-wide
    * buckets; each point lands in exactly ONE bucket, each interval is
    * replicated to the ceil(width/bucketWidth)+1 buckets it overlaps, and
    * a plain hash equi-join on the bucket id + the exact BETWEEN filter
    * recovers precisely the containment pairs (no dedup needed — a point
    * has one bucket, so each qualifying pair arises exactly once).
    *
    * Scale shape: a shuffle hash join keyed by bucket — work is
    * O(|points| + replicated |intervals| + |output|), vs the
    * BroadcastNestedLoopJoin Spark plans for a bare BETWEEN predicate
    * (|points| x |intervals| comparisons — the 100 TB killer). Pick
    * `bucketWidth` >= the typical interval width so replication stays
    * O(1) per interval; heavily-populated buckets are ordinary join skew
    * (AQE skew-join / salting territory, like any hot key). */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bk",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__bk",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    iv.join(p, Seq("__bk"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bk")
  }
}
