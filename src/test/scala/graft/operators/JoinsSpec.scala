package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** As-of and bucketed range joins (q108/q109). */
class JoinsSpec extends SparkSpec with Matchers {

  test("asofJoinStrict: strictly-prior semantics, ties excluded, no-match nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 5L),   // before any right row -> null
      (1L, 20L, 6L),   // right rows at 15 -> matches 15
      (1L, 30L, 7L),   // rights at 15, 25 -> matches 25
      (2L, 25L, 8L)    // right at 25 SAME time -> strict: null
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 15L, 100L), (1L, 25L, 200L), (2L, 25L, 300L), (2L, 40L, 400L)
    ).toDF("k", "t", "rv")
    val out = Joins.asofJoinStrict(left, right, "k", "t", "t")
      .select(col("k"), col("t"), col("lv"), col("__match.rv").as("rv"))
      .orderBy("k", "t").collect()
    out.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq shouldBe Seq(
      (1L, 10L, -1L), (1L, 20L, 100L), (1L, 30L, 200L), (2L, 25L, -1L))
  }

  test("asofJoinStrict matches a brute-force max-prior computation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (0 until 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
    val right = (0 until 200).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong * 2 + 1, i.toLong))
    // right times are odd, left times even-ish random -> occasional ties
    // across sides are possible only at odd left times; dedupe right on
    // (k, t) keeping max payload to make the expected value well-defined
    val rightDd = right.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val exp = left.map { case (k, t, lv) =>
      val cands = rightDd.filter(r => r._1 == k && r._2 < t)
      val m = if (cands.isEmpty) -1L else cands.maxBy(r => (r._2, r._3))._3
      (k, t, lv, m)
    }.sortBy(x => (x._1, x._2, x._3))
    val out = Joins.asofJoinStrict(
        left.toDF("k", "t", "lv"), rightDd.toDF("k", "t", "rv"), "k", "t", "t")
      .select(col("k"), col("t"), col("lv"), col("__match.rv").as("rv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    out shouldBe exp
  }

  test("asofJoinForwardStrict: strictly-later semantics, ties excluded, no-match nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 5L),   // rights at 15, 25 -> matches 15 (earliest later)
      (1L, 20L, 6L),   // right at 25 -> matches 25
      (1L, 30L, 7L),   // nothing later -> null
      (2L, 25L, 8L)    // right at 25 SAME time -> strict: matches 40
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 15L, 100L), (1L, 25L, 200L), (2L, 25L, 300L), (2L, 40L, 400L)
    ).toDF("k", "t", "rv")
    val out = Joins.asofJoinForwardStrict(left, right, "k", "t", "t")
      .select(col("k"), col("t"), col("lv"),
        col("__match.rv").as("rv"), col("__match.__mt").as("mt"))
      .orderBy("k", "t").collect()
    out.map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq shouldBe Seq(
      (1L, 10L, 100L, 15L), (1L, 20L, 200L, 25L), (1L, 30L, -1L, -1L),
      (2L, 25L, 400L, 40L))
  }

  test("asofJoinForwardStrict matches a brute-force min-later computation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val left = (0 until 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
    val right = (0 until 200).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong * 2 + 1, i.toLong))
    // expected = earliest strictly-later right; among equal-(k,t) rights
    // the operator picks the greatest payload struct, so the brute force
    // takes min time then max payload — no dedup needed
    val exp = left.map { case (k, t, lv) =>
      val cands = right.filter(r => r._1 == k && r._2 > t)
      val m = if (cands.isEmpty) -1L else {
        val tm = cands.map(_._2).min
        cands.filter(_._2 == tm).map(_._3).max
      }
      (k, t, lv, m)
    }.sortBy(x => (x._1, x._2, x._3))
    val out = Joins.asofJoinForwardStrict(
        left.toDF("k", "t", "lv"), right.toDF("k", "t", "rv"), "k", "t", "t")
      .select(col("k"), col("t"), col("lv"), col("__match.rv").as("rv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    out shouldBe exp
  }

  test("asofJoinNearest: closest by |Δt|, exact matches allowed, ties to earlier") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L),  // rights at 4, 14: |6| vs |4| -> 14
      (1L, 9L),   // |5| vs |5| tie -> earlier (4)
      (1L, 4L),   // exact match at 4 -> 4
      (2L, 50L),  // only right at 70 -> 70
      (3L, 5L)    // no rights for key 3 -> null
    ).toDF("k", "t").withColumn("lid", monotonically_increasing_id())
    val right = Seq((1L, 4L), (1L, 14L), (2L, 70L)).toDF("k", "t")
    val out = Joins.asofJoinNearest(left, right, "k", "t", "t")
      .select(col("k"), col("t"), col("__match.__mt").as("mt"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    out shouldBe Set(
      (1L, 10L, 14L), (1L, 9L, 4L), (1L, 4L, 4L), (2L, 50L, 70L), (3L, 5L, -1L))
  }

  test("asofJoinNearest matches a brute-force nearest computation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = (0 until 200).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val out = Joins.asofJoinNearest(left.toDF("k", "t", "lid"),
        right.toDF("k", "t"), "k", "t", "t")
      .select(col("lid"), col("__match.__mt").as("mt")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    left.foreach { case (k, t, lid) =>
      val cands = right.filter(_._1 == k).map(_._2)
      val expected = if (cands.isEmpty) None
        else Some(cands.minBy(rt => (math.abs(rt - t), rt)))
      out(lid) shouldBe expected
    }
  }

  test("asofJoinNearestSkew identical to asofJoinNearest: exact matches, " +
    "equal-distance ties, hot key, null keys, cross-bucket carries") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // planted hot key 0 (2/3 of rows) + nulls + small keys; times dense
    // enough for exact matches and equal-distance ties at bucketWidth 25
    def keyOf(i: Int): Option[Long] =
      if (i % 11 == 0) None else if (i % 3 != 2) Some(0L) else Some(rnd.nextInt(4).toLong + 1)
    val left = (0 until 500).map(i => (keyOf(i), rnd.nextInt(400).toLong, i.toLong))
    val right = (0 until 300).map(i => (keyOf(i + 7), rnd.nextInt(400).toLong))
    val l = left.toDF("k", "t", "lid")
    val r = right.toDF("k", "t")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lid"), col("__match.__mt").as("mt")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .sortBy(_._1).toSeq
    for (bw <- Seq(25L, 7L, 10000L))
      canon(Joins.asofJoinNearestSkew(l, r, "k", "t", "t", bw)) shouldBe
        canon(Joins.asofJoinNearest(l, r, "k", "t", "t"))
  }

  test("asofJoinNearestSkew plans zero joins and zero broadcasts — one " +
    "fused seeded pipeline, not two zipped halves") {
    import spark.implicits._
    val l = (0 until 300).map(i => (i % 5L, i.toLong * 3, i.toLong)).toDF("k", "t", "lid")
    val r = (0 until 200).map(i => (i % 5L, i * 2L + 1)).toDF("k", "t")
    val df = Joins.asofJoinNearestSkew(l, r, "k", "t", "t", 64L)
    df.count() shouldBe 300L
    val nodes = graft.tools.ScaleAudit.allPlanNodes(df)
    nodes.count(n => n.getClass.getSimpleName.contains("Join")) shouldBe 0
    nodes.count(n =>
      n.getClass.getSimpleName.contains("BroadcastExchange")) shouldBe 0
    df.queryExecution.logical.toString should not include "UnresolvedHint"
  }

  test("rangeJoin: exact containment incl. boundaries and bucket-spanning intervals") {
    import spark.implicits._
    val pts = Seq(0.0, 5.0, 10.0, 19.999, 20.0, 35.0, 60.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "price")
    val iv = Seq(
      (1L, 5.0, 20.0),    // inclusive both ends, spans buckets 0-2 at w=10
      (2L, 20.0, 20.0),   // degenerate point interval
      (3L, 36.0, 59.0)    // matches nothing
    ).toDF("ivid", "lo", "hi")
    val out = Joins.rangeJoin(pts, "price", iv, "lo", "hi", bucketWidth = 10.0)
      .select("ivid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    out shouldBe Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L))
  }

  test("rangeJoin plans a hash equi-join on the bucket key, not a nested loop") {
    import spark.implicits._
    val pts = (0 until 1000).map(i => (i.toLong, i * 0.1)).toDF("pid", "price")
    val iv = (0 until 100).map(i => (i.toLong, i * 1.0, i * 1.0 + 0.5))
      .toDF("ivid", "lo", "hi")
    val plan = Joins.rangeJoin(pts, "price", iv, "lo", "hi", 1.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  /** The skew-safe two-pass decomposition must be ROW-IDENTICAL to the
    * single-window shape on every edge the bucketing introduces. */
  private def asofIdentity(left: Seq[(Long, Long, Long)],
                           right: Seq[(Long, Long, Long)],
                           bucketWidth: Long): Unit = {
    import spark.implicits._
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("k", "t", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("t"), col("lv"), col("__match.rv").as("rv"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))
      .sortBy(identity).toSeq
    canon(Joins.asofJoinStrictSkew(l, r, "k", "t", "t", bucketWidth)) shouldBe
      canon(Joins.asofJoinStrict(l, r, "k", "t", "t"))
  }

  test("asofJoinStrictSkew identical to asofJoinStrict: boundary ties, " +
    "empty buckets, multi-bucket carry, strictness at equal time") {
    // bucketWidth 10; rights at exact bucket boundaries (t=10, 20),
    // a left row AT a right row's time (strictness), long gaps so the
    // carry must cross several EMPTY buckets, and a key with no rights
    val left = Seq(
      (1L, 5L, 1L), (1L, 10L, 2L), (1L, 11L, 3L), (1L, 47L, 4L),
      (1L, 95L, 5L), (2L, 20L, 6L), (2L, 21L, 7L), (3L, 30L, 8L))
    val right = Seq(
      (1L, 10L, 100L), (1L, 10L, 150L), // same (k,t) tie -> greatest pay
      (1L, 93L, 200L), (2L, 20L, 300L))
    asofIdentity(left, right, bucketWidth = 10L)
    asofIdentity(left, right, bucketWidth = 3L)
    asofIdentity(left, right, bucketWidth = 1000L) // everything one bucket
  }

  private def asofForwardIdentity(left: Seq[(Long, Long, Long)],
                                  right: Seq[(Long, Long, Long)],
                                  bucketWidth: Long): Unit = {
    import spark.implicits._
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("k", "t", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("t"), col("lv"),
        col("__match.__mt").as("mt"), col("__match.rv").as("rv"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1L else x.getLong(4)))
      .sortBy(identity).toSeq
    canon(Joins.asofJoinForwardStrictSkew(l, r, "k", "t", "t", bucketWidth)) shouldBe
      canon(Joins.asofJoinForwardStrict(l, r, "k", "t", "t"))
  }

  test("asofJoinForwardStrictSkew identical to asofJoinForwardStrict: " +
    "boundary ties, empty buckets, hot key") {
    val left = Seq(
      (1L, 5L, 1L), (1L, 10L, 2L), (1L, 11L, 3L), (1L, 47L, 4L),
      (1L, 95L, 5L), (2L, 20L, 6L), (2L, 21L, 7L), (3L, 30L, 8L))
    val right = Seq(
      (1L, 10L, 100L), (1L, 10L, 150L), (1L, 93L, 200L), (2L, 20L, 300L))
    asofForwardIdentity(left, right, 10L)
    asofForwardIdentity(left, right, 3L)
    val rnd = new scala.util.Random(31)
    val hotL = (0 until 600).map(i =>
      (if (i < 400) 0L else rnd.nextInt(4).toLong + 1L,
        rnd.nextInt(800).toLong, i.toLong))
    val hotR0 = (0 until 300).map(i =>
      (if (i < 200) 0L else rnd.nextInt(4).toLong + 1L,
        rnd.nextInt(800).toLong, i.toLong))
    val hotR = hotR0.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    asofForwardIdentity(hotL, hotR, 40L)
  }

  test("asofJoinStrictSkew identical to asofJoinStrict for NULL keys and " +
    "NULL times (the r10 carry-join dropped null-key carries)") {
    import spark.implicits._
    // null key with its carry in an EARLIER bucket (t=5 right, t=47 left
    // at bucketWidth 10 — the exact regime the null-unsafe equi-join
    // lost), plus a null-TIME right row (sorts first globally, so it is
    // the carry-of-last-resort for every later left row of its key) and
    // a null-time left row (matches only null-time right rows before it
    // in (tag, pay) order — none here, so null match)
    val left = Seq(
      (Option.empty[Long], 47L, 1L), (Option.empty[Long], 6L, 2L),
      (Some(1L), 25L, 3L), (Some(1L), 3L, 4L), (Some(2L), 9L, 5L))
      .toDF("k", "t", "lv")
      .union(Seq((Some(1L), 6L)).toDF("k", "lv")
        .select(col("k"), lit(null).cast("long").as("t"), col("lv")))
      .select("k", "t", "lv")
    val right = Seq(
      (Option.empty[Long], 5L, 100L), (Some(1L), 4L, 200L), (Some(2L), 9L, 300L))
      .toDF("k", "t", "rv")
      .union(Seq((Some(1L), 400L)).toDF("k", "rv")
        .select(col("k"), lit(null).cast("long").as("t"), col("rv")))
      .select("k", "t", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("t"), col("lv"), col("__match.rv").as("rv"))
      .collect()
      .map(x => (if (x.isNullAt(0)) -99L else x.getLong(0),
        if (x.isNullAt(1)) -99L else x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))
      .sortBy(identity).toSeq
    val skew = canon(Joins.asofJoinStrictSkew(left, right, "k", "t", "t", 10L))
    skew shouldBe canon(Joins.asofJoinStrict(left, right, "k", "t", "t"))
    // and pin the carry VALUES themselves: left (null, 47) must see
    // right (null, 5) across four empty buckets; (1, 3) must see the
    // null-TIME right row 400 carried in from the null bucket; (1, 25)
    // must see the bucket-0 right row 200, NOT the older 400
    skew.find(r => r._1 == -99L && r._2 == 47L).get._4 shouldBe 100L
    skew.find(r => r._1 == 1L && r._2 == 3L).get._4 shouldBe 400L
    skew.find(r => r._1 == 1L && r._2 == 25L).get._4 shouldBe 200L
  }

  test("asofJoinStrictSkew plans zero joins and zero broadcasts " +
    "(the r10 forced carry broadcast is gone)") {
    import spark.implicits._
    val l = (0 until 200).map(i => (i % 5L, i.toLong, i.toLong)).toDF("k", "t", "lv")
    val r = (0 until 100).map(i => (i % 5L, i * 2L + 1, i.toLong)).toDF("k", "t", "rv")
    val df = Joins.asofJoinStrictSkew(l, r, "k", "t", "t", 16L)
    df.count() shouldBe 200L
    val nodes = graft.tools.ScaleAudit.allPlanNodes(df)
    nodes.length should be > 3
    val bad = nodes.map(_.getClass.getSimpleName)
      .filter(n => n.contains("Join") || n.contains("BroadcastExchange"))
    withClue(bad.mkString(", ")) { bad shouldBe empty }
  }

  test("asofJoinStrictSkew identical to asofJoinStrict on random data " +
    "with a planted hot key") {
    val rnd = new scala.util.Random(23)
    // key 0 is hot: 500 of 700 left rows and 300 of 400 right rows
    val left = (0 until 700).map(i =>
      (if (i < 500) 0L else rnd.nextInt(4).toLong + 1L,
        rnd.nextInt(1000).toLong, i.toLong))
    val right0 = (0 until 400).map(i =>
      (if (i < 300) 0L else rnd.nextInt(4).toLong + 1L,
        rnd.nextInt(1000).toLong, i.toLong))
    // dedupe right on (k, t) so the expected match is well-defined
    val right = right0.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    asofIdentity(left, right, bucketWidth = 50L)
    asofIdentity(left, right, bucketWidth = 7L)
  }
}
