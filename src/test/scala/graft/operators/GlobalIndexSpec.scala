package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Distributed global ordered index: equals the single-partition
  * row_number without ever funneling the data through one task. */
class GlobalIndexSpec extends SparkSpec with Matchers {

  test("index equals the total-order rank on shuffled multi-partition input") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(5L)
    val rows = (0 until 5000).map(i => (i.toLong, rng.nextLong(1000))).toSeq
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(3))
      .shuffle(rows).toDF("id", "key").repartition(8)
    val out = GlobalIndex.withGlobalIndex(df, "pos", col("key"), col("id"))
      .select("pos", "id", "key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 5000
    val want = rows.sortBy(r => (r._2, r._1))
    out.sortBy(_._1).zipWithIndex.foreach { case ((pos, id, key), i) =>
      pos shouldBe i.toLong
      (id, key) shouldBe want(i)
    }
  }

  test("withRunning matches the single-partition window for all frames " +
    "and both aggs, incl. ties in the range frame") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(29)
    // heavy ties in key (range_excl must treat equal keys as one mass)
    val df = (0 until 4000).map(i =>
      (i.toLong, rnd.nextInt(60).toLong, rnd.nextInt(1000).toLong + 1))
      .toDF("id", "key", "v").repartition(7)
    def canon(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("id"), col(c)).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
        .sortBy(_._1).toSeq
    val wRows = Window.orderBy(col("key"), col("id"))
    val wRange = Window.orderBy(col("key"))
    // rows_incl sum
    canon(GlobalIndex.withRunning(df, "r", "v", "sum", "rows_incl",
      Seq(col("key"), col("id"))), "r") shouldBe
      canon(df.withColumn("r", sum(col("v")).over(
        wRows.rowsBetween(Window.unboundedPreceding, Window.currentRow))), "r")
    // rows_excl sum (first row null)
    canon(GlobalIndex.withRunning(df, "r", "v", "sum", "rows_excl",
      Seq(col("key"), col("id"))), "r") shouldBe
      canon(df.withColumn("r", sum(col("v")).over(
        wRows.rowsBetween(Window.unboundedPreceding, -1))), "r")
    // range_excl max (strictly smaller keys; ties excluded together)
    canon(GlobalIndex.withRunning(df, "r", "v", "max", "range_excl",
      Seq(col("key"), col("id")), rangeKey = Some("key")), "r") shouldBe
      canon(df.withColumn("r", max(col("v")).over(
        wRange.rangeBetween(Window.unboundedPreceding, -1))), "r")
    // range_excl sum
    canon(GlobalIndex.withRunning(df, "r", "v", "sum", "range_excl",
      Seq(col("key"), col("id")), rangeKey = Some("key")), "r") shouldBe
      canon(df.withColumn("r", sum(col("v")).over(
        wRange.rangeBetween(Window.unboundedPreceding, -1))), "r")
  }

  test("withNtile distributed arithmetic matches Spark ntile exactly " +
    "(remainder buckets, n < k, threshold forced to 0)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(3, 5, 23, 100, 101, 104)) {
      val df = (0 until n).map(i => (i.toLong, (i * 31 % 97).toLong))
        .toDF("id", "v").repartition(4)
      val got = GlobalIndex.withNtile(df, "b", 5,
          Seq(col("v"), col("id")), windowThreshold = 0L)
        .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val exp = df.withColumn("b", ntile(5).over(
          Window.orderBy(col("v"), col("id"))))
        .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      withClue(s"n=$n: ") { got shouldBe exp }
    }
  }

  test("range_excl splits a hot equal-key run across partitions and still " +
    "matches the window (skew-safe seed/offset bookkeeping)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(31)
    // 70% of rows on ONE key: with 32 shuffle partitions over 4000 rows
    // the hot run (2800 rows) MUST span many partitions under full-tuple
    // range partitioning — the exact regime the old key-only partitioning
    // could not survive at scale (one run pinned to one task).
    val df = (0 until 4000).map { i =>
      val key = if (rnd.nextInt(10) < 7) 13L else rnd.nextInt(40).toLong
      (i.toLong, key, rnd.nextInt(1000).toLong + 1)
    }.toDF("id", "key", "v").repartition(9)
    def canon(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("id"), col(c)).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
        .sortBy(_._1).toSeq
    val wRange = Window.orderBy(col("key"))
    for (agg <- Seq("sum", "max")) {
      val fn = if (agg == "sum") sum(col("v")) else max(col("v"))
      withClue(s"agg=$agg: ") {
        canon(GlobalIndex.withRunning(df, "r", "v", agg, "range_excl",
          Seq(col("key"), col("id")), rangeKey = Some("key")), "r") shouldBe
          canon(df.withColumn("r", fn.over(
            wRange.rangeBetween(Window.unboundedPreceding, -1))), "r")
      }
    }
    // hot run actually split: no output partition holds >= the hot mass
    val out = GlobalIndex.withRunning(df, "r", "v", "sum", "range_excl",
      Seq(col("key"), col("id")), rangeKey = Some("key"))
    val parts = out.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    val hot = df.where(col("key") === 13L).count()
    assert(parts.max < hot,
      s"hot run (${hot} rows) fit one partition (max part ${parts.max}) — " +
        "the skew regime was not exercised")
  }

  test("randomized stress: withRunning equals the window twin across " +
    "random key distributions, input partitionings, and aggs (the " +
    "forward-pass bookkeeping under arbitrary run/partition overlap)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val master = new scala.util.Random(97)
    for (round <- 0 until 8) {
      val n = 500 + master.nextInt(3000)
      val nKeys = round match {
        case 0 => 1                 // ONE key: the whole frame is one run
        case 1 => 2 + master.nextInt(3) // few keys: every run spans partitions
        case _ => 1 + master.nextInt(200)
      }
      val rows = (0 until n).map { i =>
        (i.toLong, master.nextInt(nKeys).toLong, (master.nextInt(999) + 1).toLong)
      }
      val df = rows.toDF("id", "key", "v")
        .repartition(1 + master.nextInt(12))
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.select(col("id"), col("r")).collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
          .sortBy(_._1).toSeq
      for (agg <- Seq("sum", "max"); frame <- Seq("rows_incl", "rows_excl", "range_excl")) {
        val fn = if (agg == "sum") sum(col("v")) else max(col("v"))
        val w0 = Window.orderBy(col("key"), col("id"))
        val w = frame match {
          case "rows_incl" => w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
          case "rows_excl" => w0.rowsBetween(Window.unboundedPreceding, -1)
          case "range_excl" => Window.orderBy(col("key"))
            .rangeBetween(Window.unboundedPreceding, -1)
        }
        withClue(s"round=$round n=$n nKeys=$nKeys agg=$agg frame=$frame: ") {
          canon(GlobalIndex.withRunning(df, "r", "v", agg, frame,
            Seq(col("key"), col("id")), rangeKey = Some("key"))) shouldBe
            canon(df.withColumn("r", fn.over(w)))
        }
      }
    }
  }

  test("range_excl precondition accepts qualified / sort-directed head " +
    "columns and rejects a non-key head") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, (i % 5).toLong, 1L))
      .toDF("id", "key", "v")
    def run(head: org.apache.spark.sql.Column) =
      GlobalIndex.withRunning(df, "r", "v", "sum", "range_excl",
        Seq(head, col("id")), rangeKey = Some("key")).count()
    run(col("key")) shouldBe 100
    run(df("key")) shouldBe 100 // resolved/qualified column
    run(col("key").asc) shouldBe 100 // explicit sort direction
    an[IllegalArgumentException] should be thrownBy run(col("id"))
    // DESC must reject LOUD: the name-only precondition would admit it,
    // but the plain-window dispatch branch hardcodes an ascending RANGE
    // frame — identical caller code would return opposite-frame values
    // depending on which side of the size threshold the data landed
    // (r13 review finding)
    an[IllegalArgumentException] should be thrownBy run(col("key").desc)
    an[IllegalArgumentException] should be thrownBy run(df("key").desc)
  }

  test("withNtile big branch with an uncounted caller derives n from the " +
    "frozen indexed frame (correct buckets without knownCount)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 303).map(i => (i.toLong, (i * 7 % 101).toLong))
      .toDF("id", "v").repartition(5)
    val got = GlobalIndex.withNtile(df, "b", 4, Seq(col("v"), col("id")),
        windowThreshold = 0L) // forced big branch, knownCount defaulted
      .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val exp = df.withColumn("b", ntile(4).over(Window.orderBy(col("v"), col("id"))))
      .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    got shouldBe exp
  }

  test("withRunningAuto and withGlobalIndexAuto: both dispatch paths agree") {
    import spark.implicits._
    val df = (0 until 800).map(i => (i.toLong, (i * 13 % 50).toLong, (i % 7 + 1).toLong))
      .toDF("id", "key", "v").repartition(5)
    def runs(th: Long) = GlobalIndex.withRunningAuto(df, "r", "v", "sum",
        "range_excl", Seq(col("key"), col("id")), rangeKey = Some("key"),
        windowThreshold = th)
      .select("id", "r").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    runs(0L) shouldBe runs(1000000L)
    def idx(th: Long) = GlobalIndex.withGlobalIndexAuto(df, "i",
        Seq(col("key"), col("id")), windowThreshold = th)
      .select("id", "i").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    idx(0L) shouldBe idx(1000000L)
  }

  test("withRunning rejects a NULL aggregate value loudly (no silent 0)") {
    import spark.implicits._
    // the Tungsten path's InternalRow.getLong reads 0 for a NULL field —
    // without the guard a caller violating the documented non-null
    // precondition would get silently wrong running aggregates (the
    // boxed-Row shape it replaced at least threw NPE); ADVICE r14
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(4L)))
      .toDF("k", "v").repartition(2)
    val ex = intercept[org.apache.spark.SparkException] {
      GlobalIndex.withRunning(df, "cum", "v", agg = "sum",
        frame = "rows_incl", sortCols = Seq(col("k"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    chain(ex).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("must be non-null")) shouldBe true
  }

  test("deterministic across runs") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i * 37 % 100).toLong))
      .toDF("id", "key").repartition(4)
    def run() = GlobalIndex.withGlobalIndex(df, "pos", col("key"), col("id"))
      .select("pos", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    run() shouldBe run()
  }
}
