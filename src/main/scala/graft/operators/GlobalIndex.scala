package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Global ordered row index WITHOUT the single-partition window trap: a
  * bare `row_number() OVER (ORDER BY ...)` funnels the entire corpus
  * through ONE task — the classic 100 TB plan killer. This decomposition
  * keeps every stage parallel:
  *
  *   1. range-repartition on the sort key (sampled boundaries, the same
  *      machinery as a distributed sort),
  *   2. sort within partitions,
  *   3. per-partition row counts -> driver prefix sums (one tiny action
  *      over nPartitions longs),
  *   4. zipWithIndex-style local index + broadcast offsets.
  *
  * The index equals the rank of the row in the total (sortCols) order —
  * verified against the SQL row_number twin. Ties MUST be broken by the
  * caller's sort columns (include a unique key last).
  *
  * All per-row passes run on the Tungsten path: `queryExecution.toRdd`
  * (UnsafeRow, zero deserialization) in, `UnsafeProjection` append out,
  * mounted back via `internalCreateDataFrame` — never `df.rdd` /
  * `Row.fromSeq`, whose GenericRow boxing costs 2-5x per row on what is,
  * at 100 TB, a full-corpus loop. toRdd rows are REUSED buffers, so any
  * value retained across rows is copied (`InternalRow.copyValue`). */
object GlobalIndex {

  /** Tungsten-path column append: stream the partition's UnsafeRows
    * through a codegen'd projection that adds one trailing LONG field.
    * `emit(row, setExtra)` sets the appended value (null allowed when
    * `nullable`) via the passed single-field buffer. */
  private def appendLongField(
      rdd: RDD[InternalRow], outSchema: StructType)(
      emit: (Int, Iterator[InternalRow], GenericInternalRow) => Iterator[InternalRow])
      : RDD[InternalRow] =
    rdd.mapPartitionsWithIndex { (i, it) =>
      val joined = new JoinedRow
      val extra = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(outSchema)
      emit(i, it, extra).map(r => proj(joined(r, extra)))
    }

  def withGlobalIndex(df: DataFrame, indexCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    // materialize the sorted layout once: the count pass and the index
    // pass must see the SAME partitions (and at scale you persist before
    // any double-pass anyway). Materialize.frozen = localCheckpoint, or
    // reliable checkpoint under spark.graft.reliableCheckpoint (the
    // preemptible-cluster switch).
    val sorted = graft.util.Materialize.frozen(
      df.repartitionByRange(n, sortCols: _*)
        .sortWithinPartitions(sortCols: _*))
    val schema = sorted.schema
    val outSchema = schema.add(indexCol, LongType, nullable = false)
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd.mapPartitionsWithIndex((i, it) =>
      Iterator.single((i, it.size)), preservesPartitioning = true).collect()
      .sortBy(_._1).map(_._2.toLong)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val indexed = appendLongField(rdd, outSchema) { (i, it, extra) =>
      var k = bc.value(i)
      it.map { r => extra.setLong(0, k); k += 1; r }
    }
    GraftExpressionBridge.internalCreateDataFrame(spark, indexed, outSchema)
  }

  /** Global RUNNING aggregate over a total order without the
    * single-partition window — the cumulative-statistics sibling of
    * [[withGlobalIndex]] (equi-depth bins, weighted medians, Pareto
    * frontiers: all "agg over everything sorted before me" shapes that
    * a bare `sum(...) OVER (ORDER BY ...)` funnels through ONE task).
    *
    * Same two-pass decomposition: range-repartition on the sort key,
    * sort within partitions, per-partition aggregate totals -> driver
    * prefix-combine (nPartitions values), then one local pass emitting
    * offset ⊕ local-running per row.
    *
    * `agg` is "sum" or "max" over a non-null LONG column. `frame`:
    *   - "rows_incl"  = ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    *   - "rows_excl"  = ROWS BETWEEN UNBOUNDED PRECEDING AND -1
    *   - "range_excl" = RANGE BETWEEN UNBOUNDED PRECEDING AND -1 over
    *     `rangeKey` (strictly smaller keys only — equal-key runs MAY
    *     split across partitions; the driver walk below reconstructs
    *     each partition's strictly-smaller offset and same-key seed)
    * An empty frame yields NULL, matching the window semantics. Ties in
    * the ROWS frames must be broken by the caller's sort columns
    * (include a unique key last), exactly like the window formulation
    * they replace.
    *
    * PRECONDITION (range_excl): `sortCols` must order by `rangeKey`
    * FIRST — the per-partition run tracking (k != lastKey) assumes
    * equal-key rows are CONTIGUOUS in the partition sort; an interleaved
    * order (some other column first) would over-commit same-key mass
    * into the strictly-smaller frame. Enforced below against the head
    * sort column's leaf attribute (qualifier- and direction-insensitive).
    *
    * SKEW SAFETY (range_excl): partitioning uses the FULL sort tuple, so
    * an equal-key run MAY split across partitions — a hot key holding
    * half a 100 TB corpus spreads over many tasks instead of pinning one
    * (the hot-partition rule). The cross-partition bookkeeping stays
    * exact: a per-partition stats pass records (firstKey, lastKey,
    * agg-below-lastKey, lastKey-run agg); a driver walk over those
    * nPartitions tuples derives, for each partition, the strictly-
    * smaller-key offset AND the earlier-partition mass of its first key,
    * which seeds the local pending run so it commits only at key change. */
  def withRunning(df: DataFrame, runCol: String, aggCol: String,
                  agg: String, frame: String,
                  sortCols: Seq[Column], rangeKey: Option[String] = None): DataFrame = {
    require(Set("sum", "max")(agg), s"unknown agg '$agg'")
    require(Set("rows_incl", "rows_excl", "range_excl")(frame),
      s"unknown frame '$frame'")
    require(frame != "range_excl" || rangeKey.nonEmpty,
      "range_excl needs the rangeKey column")
    require(frame != "range_excl" ||
      sortCols.headOption.exists(c => headAttrName(c).contains(rangeKey.get)),
      s"range_excl requires sortCols to order by the rangeKey " +
        s"'${rangeKey.orNull}' first (got head sort column " +
        s"'${sortCols.headOption.orNull}'): equal-key runs must be " +
        "contiguous within partitions")
    // leafAttrName is deliberately direction-insensitive (resolved/.asc
    // columns must not be false-rejected), so DESC needs its own loud
    // reject: the plain-window dispatch branch hardcodes an ascending
    // RANGE frame while this path would honor the descending order —
    // identical caller code would return opposite-frame values depending
    // on which side of the size threshold the data landed.
    require(frame != "range_excl" ||
      !sortCols.headOption.exists(
        org.apache.spark.sql.GraftExpressionBridge.isDescendingSort),
      "range_excl requires an ASCENDING rangeKey order (strictly-smaller " +
        "frame); rewrite a descending cumulate as range_excl over the " +
        "negated key")
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = graft.util.Materialize.frozen(
      df.repartitionByRange(n, sortCols: _*)
        .sortWithinPartitions(sortCols: _*))
    val schema = sorted.schema
    val aggIdx = schema.fieldIndex(aggCol)
    // Loud guard on the documented non-null precondition: toRdd's
    // InternalRow.getLong silently yields 0 for a NULL field (the boxed
    // Row.getLong this path replaced threw NPE), which would turn a
    // caller contract violation into silently wrong running aggregates
    // (ADVICE r14). A function VALUE, not a nested def — a def lifts
    // onto the module and drags the non-serializable GlobalIndex$ into
    // the task closures.
    val aggVal: InternalRow => Long = {
      val idx = aggIdx; val name = aggCol
      r => {
        if (r.isNullAt(idx))
          throw new IllegalArgumentException(
            s"withRunning: aggregate column '$name' must be non-null")
        r.getLong(idx)
      }
    }
    val isSum = agg == "sum"
    def combine(a: Long, b: Long): Long = if (isSum) a + b else math.max(a, b)
    def comb(a: Option[Long], b: Option[Long]): Option[Long] = (a, b) match {
      case (Some(x), Some(y)) => Some(combine(x, y))
      case (Some(x), None) => Some(x)
      case (None, y) => y
    }
    val outSchema = schema.add(runCol, LongType, nullable = true)
    def setOpt(extra: GenericInternalRow, v: Option[Long]): Unit =
      if (v.isEmpty) extra.setNullAt(0) else extra.setLong(0, v.get)
    val rdd = sorted.queryExecution.toRdd
    val out = if (frame != "range_excl") {
      // ROWS frames: per-partition totals -> driver prefix-combine.
      val totals = rdd.mapPartitionsWithIndex({ (i, it) =>
        var acc = Option.empty[Long]
        it.foreach { r => acc = comb(acc, Some(aggVal(r))) }
        Iterator.single((i, acc))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)
      // offsets(i) = combine of every partition strictly before i
      val offsets = totals.scanLeft(Option.empty[Long])(comb).init
      val bc = spark.sparkContext.broadcast(offsets)
      val incl = frame == "rows_incl"
      appendLongField(rdd, outSchema) { (i, it, extra) =>
        var committed = bc.value(i)
        it.map { r =>
          val v = aggVal(r)
          val value =
            if (incl) { committed = comb(committed, Some(v)); committed }
            else { val before = committed; committed = comb(committed, Some(v)); before }
          setOpt(extra, value); r
        }
      }
    } else {
      // RANGE frame, skew-safe: runs may span partitions. Stats pass
      // (one tiny tuple per partition — never row-sized on the driver):
      // (firstKey, lastKey, body = agg over keys strictly before lastKey,
      //  tail = agg of the lastKey run). total(i) = comb(body, tail).
      val keyIdx = schema.fieldIndex(rangeKey.get)
      val keyType = schema(keyIdx).dataType
      val stats: Array[Option[(Any, Any, Option[Long], Option[Long])]] =
        rdd.mapPartitionsWithIndex({ (i, it) =>
          var fk: Any = null; var lk: Any = null
          var body = Option.empty[Long]; var run = Option.empty[Long]
          var started = false
          it.foreach { r =>
            // toRdd rows are reused buffers: a key RETAINED across rows
            // (fk/lk) must be copied, or the next row overwrites it
            val k = r.get(keyIdx, keyType)
            if (!started) {
              val kc = InternalRow.copyValue(k); fk = kc; lk = kc; started = true
            } else if (k != lk) {
              body = comb(body, run); run = None; lk = InternalRow.copyValue(k)
            }
            run = comb(run, Some(aggVal(r)))
          }
          Iterator.single((i, if (started) Some((fk, lk, body, run)) else None))
        }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)
      val nP = stats.length
      // ONE forward pass over the nPartitions stat tuples — O(nP) driver
      // work even when a hot run spans most partitions (the backward
      // walk this replaces re-scanned the run's partitions per member:
      // O(nP^2) exactly in the skew regime this path exists for).
      // Invariant while scanning (partitions are range-ordered and
      // internally sorted, so every key's rows are GLOBALLY contiguous):
      //   curKey    = last key seen so far (the max),
      //   curTail   = agg of curKey's rows seen so far (its trailing run),
      //   massBelow = agg of all rows with key strictly below curKey.
      // Partition i starting on fk == curKey continues the open run:
      // offset = massBelow, seed = curTail. Starting on a NEW key, the
      // open run closes beneath it: offset = massBelow + curTail.
      val offBelow = Array.fill(nP)(Option.empty[Long])
      val seed = Array.fill(nP)(Option.empty[Long])
      val firstKeys = new Array[Any](nP)
      var massBelow = Option.empty[Long]
      var curTail = Option.empty[Long]
      var curKey: Any = null
      var haveKey = false
      for (i <- 0 until nP; s <- stats(i)) {
        val (fk, lk, body, tail) = s
        firstKeys(i) = fk
        if (haveKey && fk == curKey) {
          offBelow(i) = massBelow
          seed(i) = curTail
        } else {
          offBelow(i) = comb(massBelow, curTail)
          seed(i) = None
        }
        if (haveKey && lk == curKey) {
          // partition i is entirely the open run (fk == lk == curKey,
          // body == None by construction)
          curTail = comb(curTail, tail)
        } else {
          // lk is a strictly larger key: everything earlier — the old
          // run and this partition's body (keys < lk) — drops below it
          massBelow = comb(comb(massBelow, curTail), body)
          curKey = lk
          curTail = tail
          haveKey = true
        }
      }
      val bc = spark.sparkContext.broadcast((offBelow, seed, firstKeys))
      appendLongField(rdd, outSchema) { (i, it, extra) =>
        val (ob, sd, fks) = bc.value
        var committed = ob(i) // strictly-smaller-key mass, cross-partition
        var pending = sd(i) // current equal-key run (seeded w/ earlier mass)
        var lastKey: Any = fks(i) // == first row's key by construction
        it.map { r =>
          val k = r.get(keyIdx, keyType)
          if (k != lastKey) {
            committed = comb(committed, pending)
            pending = None
            lastKey = InternalRow.copyValue(k)
          }
          pending = comb(pending, Some(aggVal(r)))
          setOpt(extra, committed); r
        }
      }
    }
    GraftExpressionBridge.internalCreateDataFrame(spark, out, outSchema)
  }

  /** Leaf attribute name of the head sort column via the ColumnNode walk
    * in [[org.apache.spark.sql.GraftExpressionBridge.leafAttrName]] —
    * qualifier- and sort-direction-insensitive (ADVICE r12); unrecognized
    * shapes yield None and the require fails loud (the safe direction). */
  private def headAttrName(c: Column): Option[String] =
    org.apache.spark.sql.GraftExpressionBridge.leafAttrName(c)

  /** Dispatch plumbing shared by the Auto entry points. Callers that
    * already know the row count pass `knownCount` and skip the count
    * entirely — the pageRankDistributed pattern, and MANDATORY for
    * chained calls (q233's triple ntile, q262's forced stack): with the
    * count known, the plain-window branches are pure `withColumn`s that
    * FUSE into one lazy plan, so a whole chain computes its input once.
    * Without it, ONE uncached count job runs and the chosen path binds
    * the original plan lazily (the input computes at most twice — once
    * for the count, once at consumption; it is model-sized below the
    * threshold by the operator's contract). NOTHING is cached or
    * frozen here: the r12.0 shape cached + froze the input per call,
    * which both accumulated state the ADVICE flagged AND cost an extra
    * materialization pass per call (q174/q240/q241 measured 2.1-2.8x
    * solo); the big path needs no pre-pass either, because
    * withRunning/withGlobalIndex freeze their own repartitioned copy
    * eagerly as their first step. */
  private def dispatched(df0: DataFrame, windowThreshold: Long, knownCount: Long)
                        (small: DataFrame => DataFrame)
                        (big: DataFrame => DataFrame): DataFrame = {
    val n = if (knownCount >= 0L) knownCount else df0.count()
    if (n <= windowThreshold) small(df0) else big(df0)
  }

  /** Size-dispatched running aggregate (duplicateClusters' crossover
    * discipline): the model-sized frames the report queries cumulate
    * (distinct-value histograms, per-customer rollups) are FINE in one
    * task below the threshold — one cheap count on the already-reduced
    * frame picks the plain window there, and [[withRunning]]'s two-pass
    * decomposition takes over above it (identical values, spec-pinned).
    * The two paths are indistinguishable to a caller. */
  def withRunningAuto(df0: DataFrame, runCol: String, aggCol: String,
                      agg: String, frame: String, sortCols: Seq[Column],
                      rangeKey: Option[String] = None,
                      windowThreshold: Long = 2000000L,
                      knownCount: Long = -1L): DataFrame =
    dispatched(df0, windowThreshold, knownCount) { df =>
      import org.apache.spark.sql.expressions.Window
      val w = frame match {
        case "rows_incl" => Window.orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        case "rows_excl" => Window.orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        case "range_excl" => Window.orderBy(col(rangeKey.getOrElse(
            throw new IllegalArgumentException("range_excl needs rangeKey"))))
          .rangeBetween(Window.unboundedPreceding, -1)
        case other => throw new IllegalArgumentException(s"unknown frame '$other'")
      }
      val fn = if (agg == "sum") sum(col(aggCol))
        else if (agg == "max") max(col(aggCol))
        else throw new IllegalArgumentException(s"unknown agg '$agg'")
      df.withColumn(runCol, fn.over(w))
    }(withRunning(_, runCol, aggCol, agg, frame, sortCols, rangeKey))

  /** Size-dispatched global row index: plain row_number window below the
    * threshold, [[withGlobalIndex]] above. Index is 0-based. */
  def withGlobalIndexAuto(df0: DataFrame, indexCol: String,
                          sortCols: Seq[Column],
                          windowThreshold: Long = 2000000L,
                          knownCount: Long = -1L): DataFrame =
    dispatched(df0, windowThreshold, knownCount) { df =>
      import org.apache.spark.sql.expressions.Window
      df.withColumn(indexCol,
        (row_number().over(Window.orderBy(sortCols: _*)) - 1).cast("long"))
    }(withGlobalIndex(_, indexCol, sortCols: _*))

  /** Size-dispatched global NTILE: Spark's ntile window below the
    * threshold; above it the bucket comes from the distributed global
    * rank via Spark's exact ntile arithmetic (the first n mod k buckets
    * take ceil(n/k) rows, the rest floor(n/k) — spec-pinned parity). */
  def withNtile(df0: DataFrame, outCol: String, k: Int, sortCols: Seq[Column],
                windowThreshold: Long = 2000000L,
                knownCount: Long = -1L): DataFrame = {
    require(k > 0)
    // the big branch needs the realized count for the bucket arithmetic,
    // so the dispatch helper is inlined here (same no-cache rule)
    val df = df0
    val nDispatch = if (knownCount >= 0L) knownCount else df0.count()
    if (nDispatch <= windowThreshold) {
      import org.apache.spark.sql.expressions.Window
      df.withColumn(outCol, ntile(k).over(Window.orderBy(sortCols: _*)))
    } else {
      val indexed = withGlobalIndex(df, "__gi", sortCols: _*) // eager freeze inside
      // n is CORRECTNESS-load-bearing here (unlike the dispatch
      // threshold): for an uncounted caller, derive it from the frozen
      // indexed frame — a nondeterministic input plan (sample(),
      // repartitionByRange-derived) re-evaluated after the dispatch
      // count could otherwise hold a different row count than the one
      // the bucket arithmetic was sized for (ADVICE r12). Counting
      // materialized blocks is metadata-cheap.
      val n = if (knownCount >= 0L) knownCount else indexed.count()
      val base = n / k
      val rem = n % k
      val big = base + 1
      val r = col("__gi") + 1 // 1-based global rank
      val bucket =
        if (base == 0L) r // n < k: one row per bucket, Spark's behavior
        else when(r <= lit(rem * big), (r - 1) / lit(big) + 1)
          .otherwise(lit(rem) + (r - 1 - lit(rem * big)) / lit(base) + 1)
      indexed.withColumn(outCol, bucket.cast("int")).drop("__gi")
    }
  }
}
