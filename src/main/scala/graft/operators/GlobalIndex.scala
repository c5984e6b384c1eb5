package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

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
  * caller's sort columns (include a unique key last). */
object GlobalIndex {

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
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex((i, it) =>
      Iterator.single((i, it.size)), preservesPartitioning = true).collect()
      .sortBy(_._1).map(_._2.toLong)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val indexed = rdd.mapPartitionsWithIndex { (i, it) =>
      var k = bc.value(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
    }
    spark.createDataFrame(indexed,
      schema.add(indexCol, org.apache.spark.sql.types.LongType, nullable = false))
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
    *     `rangeKey` (strictly smaller keys only — equal-key runs are
    *     never split across range partitions, so the cross-partition
    *     offset is always strictly-smaller mass)
    * An empty frame yields NULL, matching the window semantics. Ties in
    * the ROWS frames must be broken by the caller's sort columns
    * (include a unique key last), exactly like the window formulation
    * they replace.
    *
    * PRECONDITION (range_excl): `sortCols` must order by `rangeKey`
    * FIRST. Partitioning is on the key alone, and the per-partition run
    * tracking (k != lastKey) assumes equal-key rows are CONTIGUOUS in
    * the partition sort — an interleaved order (some other column first)
    * would over-commit same-key mass into the strictly-smaller frame.
    * Enforced below against the head sort column's expression string. */
  def withRunning(df: DataFrame, runCol: String, aggCol: String,
                  agg: String, frame: String,
                  sortCols: Seq[Column], rangeKey: Option[String] = None): DataFrame = {
    require(Set("sum", "max")(agg), s"unknown agg '$agg'")
    require(Set("rows_incl", "rows_excl", "range_excl")(frame),
      s"unknown frame '$frame'")
    require(frame != "range_excl" || rangeKey.nonEmpty,
      "range_excl needs the rangeKey column")
    require(frame != "range_excl" ||
      sortCols.headOption.exists(c =>
        c.toString == rangeKey.get || c.toString == col(rangeKey.get).toString),
      s"range_excl requires sortCols to order by the rangeKey " +
        s"'${rangeKey.orNull}' first (got head sort column " +
        s"'${sortCols.headOption.orNull}'): equal-key runs must be " +
        "contiguous within partitions")
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // range_excl partitions on the RANGE KEY ALONE: boundaries over the
    // full sort tuple would split an equal-key run across partitions
    // (different tie-break ids land either side of a (key, id) boundary),
    // and the cross-partition offset would then include same-key mass —
    // exactly the ties the frame must exclude. Partitioning on the key
    // keeps every equal-key run whole; one run must fit a partition
    // (far weaker than the single-task global sort this replaces).
    val partCols = if (frame == "range_excl") Seq(col(rangeKey.get)) else sortCols
    val sorted = graft.util.Materialize.frozen(
      df.repartitionByRange(n, partCols: _*)
        .sortWithinPartitions(sortCols: _*))
    val schema = sorted.schema
    val aggIdx = schema.fieldIndex(aggCol)
    val keyIdx = rangeKey.map(schema.fieldIndex)
    def combine(a: Long, b: Long): Long = if (agg == "sum") a + b else math.max(a, b)
    val rdd = sorted.rdd
    val totals = rdd.mapPartitionsWithIndex({ (i, it) =>
      var acc = Option.empty[Long]
      it.foreach { r =>
        val v = r.getLong(aggIdx)
        acc = Some(acc.fold(v)(combine(_, v)))
      }
      Iterator.single((i, acc))
    }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)
    // offsets(i) = combine of every partition strictly before i
    val offsets = totals.scanLeft(Option.empty[Long]) { (o, t) =>
      (o, t) match {
        case (Some(a), Some(b)) => Some(combine(a, b))
        case (Some(a), None) => Some(a)
        case (None, b) => b
      }
    }.init
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var committed = bc.value(i) // agg over the frame's cross-partition part
      var pending = Option.empty[Long] // range_excl: current equal-key run
      var lastKey: Any = null
      var started = false
      def comb(a: Option[Long], b: Option[Long]): Option[Long] = (a, b) match {
        case (Some(x), Some(y)) => Some(combine(x, y))
        case (Some(x), None) => Some(x)
        case (None, y) => y
      }
      it.map { r =>
        val v = r.getLong(aggIdx)
        val value: Option[Long] = frame match {
          case "rows_incl" =>
            committed = comb(committed, Some(v)); committed
          case "rows_excl" =>
            val before = committed
            committed = comb(committed, Some(v)); before
          case "range_excl" =>
            val k = r.get(keyIdx.get)
            if (!started || k != lastKey) {
              committed = comb(committed, pending)
              pending = None
              lastKey = k
              started = true
            }
            pending = comb(pending, Some(v))
            committed
        }
        Row.fromSeq(r.toSeq :+ value.map(Long.box).orNull)
      }
    }
    spark.createDataFrame(out,
      schema.add(runCol, org.apache.spark.sql.types.LongType, nullable = true))
  }

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
    val n = if (knownCount >= 0L) knownCount else df0.count()
    if (n <= windowThreshold) {
      import org.apache.spark.sql.expressions.Window
      df.withColumn(outCol, ntile(k).over(Window.orderBy(sortCols: _*)))
    } else {
      val base = n / k
      val rem = n % k
      val big = base + 1
      val indexed = withGlobalIndex(df, "__gi", sortCols: _*) // eager freeze inside
      val r = col("__gi") + 1 // 1-based global rank
      val bucket =
        if (base == 0L) r // n < k: one row per bucket, Spark's behavior
        else when(r <= lit(rem * big), (r - 1) / lit(big) + 1)
          .otherwise(lit(rem) + (r - 1 - lit(rem * big)) / lit(base) + 1)
      indexed.withColumn(outCol, bucket.cast("int")).drop("__gi")
    }
  }
}
