package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Randomized-stress extension of GlobalIndexSpec's withRunning pattern
  * to the two remaining multi-variant operators whose specs enumerated
  * hand-picked cases only (VERDICT r13 task 8): `withNtile` (both
  * dispatch branches vs Spark's ntile window) and the as-of family
  * (strict / forward-strict / nearest, plus their skew twins, vs a
  * driver brute force). ≥32 random configs each over (distribution,
  * partitioning, k / tie density / key skew). */
class RandomizedStressSpec extends SparkSpec with Matchers {

  test("randomized stress: withNtile equals Spark's ntile across random " +
    "sizes, k, tie densities and partitionings — BOTH dispatch branches") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val master = new scala.util.Random(131)
    for (round <- 0 until 32) {
      val n = 10 + master.nextInt(2500)
      val k = 1 + master.nextInt(20)
      // tie density: values drawn mod M — M=1 collapses ALL rows onto
      // one value (pure tie-break by id), small M makes heavy tie runs
      val m = round % 4 match {
        case 0 => 1
        case 1 => 1 + master.nextInt(5)
        case _ => 1 + master.nextInt(500)
      }
      val rows = (0 until n).map(i => (i.toLong, master.nextInt(m).toLong))
      val df = rows.toDF("id", "v").repartition(1 + master.nextInt(12))
      val exp = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      // big branch (forced two-pass) and small branch (plain window via
      // a threshold above n) must both match Spark exactly
      for ((label, th) <- Seq("big" -> 0L, "small" -> (n + 1).toLong)) {
        val got = GlobalIndex.withNtile(df, "b", k, Seq(col("v"), col("id")),
            windowThreshold = th)
          .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
        withClue(s"round=$round n=$n k=$k mod=$m branch=$label: ") {
          got shouldBe exp
        }
      }
    }
  }

  test("randomized stress: as-of family (strict / forward / nearest + " +
    "skew twins) equals a driver brute force across random key skew, " +
    "tie densities, null keys, negative time axes and partitionings") {
    import spark.implicits._
    val master = new scala.util.Random(137)
    for (round <- 0 until 32) {
      val nL = 30 + master.nextInt(300)
      val nR = 20 + master.nextInt(200)
      val nKeys = 1 + master.nextInt(6)
      val tSpan = Seq(20, 100, 1000)(master.nextInt(3))
      // every third round shifts the time axis NEGATIVE: floor-bucketing
      // of negative times (floor(-x/w) != -floor(x/w)) and the forward
      // twin's negation path (whose negated axis is then positive) both
      // get exercised, straddling zero
      val tOff = if (round % 3 == 2) -(tSpan / 2).toLong else 0L
      // key skew: half the rounds pour ~60% of both sides onto key 0;
      // every fourth round also injects NULL keys (grouped like any
      // other key by the window partitioning)
      val hot = round % 2 == 0
      val nulls = round % 4 == 0
      def drawKey(): Option[Long] = {
        if (nulls && master.nextInt(10) == 0) None
        else if (hot && master.nextBoolean()) Some(0L)
        else Some(master.nextInt(nKeys).toLong)
      }
      val left = (0 until nL).map(i =>
        (drawKey(), master.nextInt(tSpan).toLong + tOff, i.toLong))
      // dedupe rights per (key, t) keeping max payload: tie order among
      // same-(k,t) rights is contract-documented as greatest-payload,
      // dedup makes the brute force independent of it
      val right = (0 until nR).map(i =>
        (drawKey(), master.nextInt(tSpan).toLong + tOff, i.toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val lDf = left.toDF("k", "t", "lv").repartition(1 + master.nextInt(8))
      val rDf = right.toDF("k", "t", "rv").repartition(1 + master.nextInt(8))
      val bw = 1L + master.nextInt(tSpan) // skew-twin bucket width

      // brute force (null key = a regular group, like partitionBy)
      def cands(k: Option[Long]) = right.filter(_._1 == k)
      val expStrict = left.map { case (k, t, lv) =>
        val c = cands(k).filter(_._2 < t)
        (lv, if (c.isEmpty) -1L else c.maxBy(r => (r._2, r._3))._3)
      }.toMap
      val expFwd = left.map { case (k, t, lv) =>
        val c = cands(k).filter(_._2 > t)
        (lv, if (c.isEmpty) -1L else c.minBy(r => (r._2, -r._3))._3)
      }.toMap
      val expNear = left.map { case (k, t, lv) =>
        val c = cands(k)
        val m = if (c.isEmpty) -1L
          else c.minBy(r => (math.abs(r._2 - t), r._2))._2 // tie -> earlier
        (lv, m)
      }.toMap

      def gotRv(df: org.apache.spark.sql.DataFrame) =
        df.select(col("lv"), col("__match.rv")).collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      def gotMt(df: org.apache.spark.sql.DataFrame) =
        df.select(col("lv"), col("__match.__mt")).collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

      val clue = s"round=$round nL=$nL nR=$nR keys=$nKeys span=$tSpan " +
        s"tOff=$tOff hot=$hot nulls=$nulls bw=$bw: "
      withClue(clue + "strict: ") {
        gotRv(Joins.asofJoinStrict(lDf, rDf, "k", "t", "t")) shouldBe expStrict
      }
      withClue(clue + "forward: ") {
        gotRv(Joins.asofJoinForwardStrict(lDf, rDf, "k", "t", "t")) shouldBe expFwd
      }
      withClue(clue + "nearest: ") {
        gotMt(Joins.asofJoinNearest(lDf, rDf, "k", "t", "t")) shouldBe expNear
      }
      // skew twins: identical contract, every fourth round (they carry
      // their own plan-shape specs; here only value parity is at stake)
      if (round % 4 == 1) {
        withClue(clue + "strictSkew: ") {
          gotRv(Joins.asofJoinStrictSkew(lDf, rDf, "k", "t", "t", bw)) shouldBe
            expStrict
        }
        withClue(clue + "forwardSkew: ") {
          gotRv(Joins.asofJoinForwardStrictSkew(lDf, rDf, "k", "t", "t", bw)) shouldBe
            expFwd
        }
        withClue(clue + "nearestSkew: ") {
          gotMt(Joins.asofJoinNearestSkew(lDf, rDf, "k", "t", "t", bw)) shouldBe
            expNear
        }
      }
    }
  }

  test("randomized stress: locfGrid equals a driver brute force across " +
    "random steps, gap structures, slot-tie densities and partitionings") {
    import spark.implicits._
    val master = new scala.util.Random(149)
    for (round <- 0 until 32) {
      val nKeys = 1 + master.nextInt(6)
      val nObs = 5 + master.nextInt(200)
      val step = Seq(1L, 7L, 100L, 1000L)(master.nextInt(4))
      val span = step * (1 + master.nextInt(40)) // dense..gappy grids
      val rows = (0 until nObs).map { i =>
        (master.nextInt(nKeys).toLong,
          (master.nextDouble() * span).toLong, i * 10.0, i.toLong)
      }
      val df = rows.toDF("k", "ts", "v", "tie")
        .repartition(1 + master.nextInt(8))
      val got = Resample.locfGrid(df, "k", "ts", "v", step, "tie")
        .select(col("k"), col("slot"), col("value"), col("is_observed"))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getInt(3))))
        .sortBy(_._1).toSeq
      // brute force: per key, slots over [min, max]; slot-last by
      // (ts, tie) desc; LOCF = latest slot-last at or before the slot
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (k, obs) =>
        val slotOf = obs.map(o => (o._2 / step, o))
        val lastPerSlot = slotOf.groupBy(_._1).map { case (s, xs) =>
          s -> xs.map(_._2).maxBy(o => (o._2, o._4))._3
        }
        val lo = slotOf.map(_._1).min
        val hi = slotOf.map(_._1).max
        (lo to hi).map { s =>
          val filled = (lo to s).reverse.collectFirst {
            case t if lastPerSlot.contains(t) => lastPerSlot(t) }
          ((k, s), (filled.getOrElse(Double.NaN),
            if (lastPerSlot.contains(s)) 1 else 0))
        }
      }.sortBy(_._1)
      withClue(s"round=$round keys=$nKeys obs=$nObs step=$step span=$span: ") {
        got shouldBe exp
      }
    }
  }

  test("randomized stress: changelog applyLatestWins equals a driver " +
    "brute force across random op mixes, tombstone/reinsert chains and " +
    "partitionings") {
    import spark.implicits._
    val master = new scala.util.Random(151)
    for (round <- 0 until 32) {
      val nKeys = 1 + master.nextInt(40)
      // base covers a random subset of the key space
      val baseRows = (0 until nKeys)
        .filter(_ => master.nextBoolean())
        .map(k => (k.toLong, master.nextInt(1000).toDouble))
      // per key: 0..6 ops at distinct seqs >= 1 (the strictly-increasing
      // contract), op mix weighted toward U with D tombstones and
      // I reinserts interleaved
      val ops = (0 until nKeys).flatMap { k =>
        val n = master.nextInt(7)
        master.shuffle((1 to 20).toList).take(n).map { seq =>
          val op = master.nextInt(10) match {
            case 0 | 1 => "D"
            case 2 => "I"
            case _ => "U"
          }
          (k.toLong, master.nextInt(1000).toDouble, seq.toLong, op)
        }
      }
      val base = baseRows.toDF("k", "v").repartition(1 + master.nextInt(6))
      val changes = ops.toDF("k", "v", "seq", "op")
        .repartition(1 + master.nextInt(6))
      val got = Changelog.applyLatestWins(base, changes, "k", "seq", "op")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      // brute force: per key, the record at max (seq, op) wins (op desc:
      // 'U' > 'I' > 'D'); a winning tombstone drops the key
      val records = baseRows.map { case (k, v) => (k, v, 0L, "I") } ++ ops
      val exp = records.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val win = rs.maxBy(r => (r._3, r._4))
        if (win._4 == "D") None else Some((k, win._2))
      }.sortBy(_._1)
      withClue(s"round=$round keys=$nKeys base=${baseRows.size} ops=${ops.size}: ") {
        got shouldBe exp
      }
    }
  }

  test("randomized stress: rangeJoin equals a brute-force containment " +
    "filter across random interval lengths (incl. domain-spanning), " +
    "bucket widths and partitionings") {
    import spark.implicits._
    val master = new scala.util.Random(139)
    for (round <- 0 until 32) {
      val nP = 50 + master.nextInt(400)
      val nI = 10 + master.nextInt(80)
      val span = 1000.0
      val pts = (0 until nP).map(i => (i.toLong, master.nextDouble() * span))
      // interval lengths: mostly short, every round a few long ones,
      // every fourth round one spanning the whole domain (the hot-
      // interval regime rangejoin100 audits at 15M rows)
      val ivs = (0 until nI).map { i =>
        val lo = master.nextDouble() * span
        val len =
          if (round % 4 == 0 && i == 0) span
          else if (master.nextInt(5) == 0) master.nextDouble() * span / 2
          else master.nextDouble() * 20
        (i.toLong, math.min(lo, span - len), math.min(lo, span - len) + len)
      }
      val bw = Seq(1.0, 7.3, 50.0, span)(master.nextInt(4))
      val exp = (for {
        (iid, lo, hi) <- ivs
        (pid, x) <- pts
        if x >= lo && x <= hi
      } yield (iid, pid)).sorted
      val got = Joins.rangeJoin(
          pts.toDF("pid", "x").repartition(1 + master.nextInt(8)), "x",
          ivs.toDF("iid", "lo", "hi").repartition(1 + master.nextInt(6)),
          "lo", "hi", bucketWidth = bw)
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      withClue(s"round=$round nP=$nP nI=$nI bw=$bw: ") {
        got shouldBe exp
      }
    }
  }
}
