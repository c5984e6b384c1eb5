package graft.pipeline

import graft.SparkSpec
import graft.text.Packing
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Training-data assembly: deterministic mixture sampling + greedy
  * sequence packing (q88/q89). */
class PackingSpec extends SparkSpec with Matchers {

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("packGreedy: shard fills respect the budget except oversize singletons") {
    // tokens: a=3, b=4, c=5 words etc. budget 8 -> [a,b]=7, [c]=5 ...
    val docs = mkDocs(Seq(
      (0L, "s", "w w w"), (1L, "s", "w w w w"), (2L, "s", "w w w w w"),
      (3L, "s", "w w w w w w w w w w"), // oversize (10 > 8): alone
      (4L, "s", "w w"), (5L, "s", "w w w w w w")))
    val out = Packing.packGreedy(docs, budget = 8, chunkSize = 100)
      .orderBy("doc_id").collect()
    out.map(_.getLong(4)).toSeq shouldBe Seq(0L, 0L, 1L, 2L, 3L, 3L)
    // every multi-doc shard's fill <= budget, and any oversize doc
    // (n_tokens > budget) must be the only member of its shard
    val byShard = out.groupBy(_.getLong(4)).values
    byShard.foreach { rows =>
      val fill = rows.map(_.getLong(3)).sum
      if (rows.length > 1) assert(fill <= 8L, s"multi-doc shard overflows: $fill")
    }
    out.filter(_.getLong(3) > 8L).foreach { r =>
      val mates = out.count(_.getLong(4) == r.getLong(4))
      assert(mates == 1, s"oversize doc ${r.getLong(0)} shares shard with others")
    }
  }

  test("packGreedy: chunk boundaries reset the fold and bound group size") {
    val docs = mkDocs(Seq(
      (98L, "s", "w w w"), (99L, "s", "w w w"),
      (100L, "s", "w w w"), (101L, "s", "w w w")))
    val out = Packing.packGreedy(docs, budget = 100, chunkSize = 100)
      .orderBy("doc_id").collect()
    out.map(_.getLong(2)).toSeq shouldBe Seq(0L, 0L, 1L, 1L)
    // both chunks start their own shard 0 even though all 4 would fit
    out.map(_.getLong(4)).toSeq shouldBe Seq(0L, 0L, 0L, 0L)
  }

  test("packGreedy is deterministic across runs and partitionings") {
    val docs = mkDocs((0L until 200L).map(i =>
      (i, s"src${i % 3}", ("w " * (1 + (i % 37).toInt)).trim)))
    val a = Packing.packGreedy(docs, 40, 50).orderBy("doc_id").collect().toSeq
    val b = Packing.packGreedy(docs.repartition(7), 40, 50)
      .orderBy("doc_id").collect().toSeq
    a shouldBe b
  }

  test("sampleHashPpm matches unreduced BigInt hash at huge doc_id (no overflow)") {
    import spark.implicits._
    val keys = Seq(0L, 42L, 3470000000L, 1L << 40, (1L << 62) + 13, Long.MaxValue - 7)
    val got = keys.toDF("doc_id")
      .select(Packing.sampleHashPpm(col("doc_id")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val want = keys.map { k =>
      (((BigInt(k) * BigInt(2654435761L) + 101) mod BigInt(2147483647L))
        mod BigInt(1000000L)).toLong
    }
    got shouldBe want
  }

  test("chunk key is exact integer division above 2^53 (no double rounding)") {
    val base = 1L << 54
    val docs = mkDocs(Seq(
      (base + 1, "s", "w w"), (base + 101, "s", "w w"), (base + 201, "s", "w w")))
    val out = Packing.packGreedy(docs, budget = 10, chunkSize = 100)
      .orderBy("doc_id").collect()
    out.map(_.getLong(2)).toSeq shouldBe Seq(
      (base + 1) / 100L, (base + 101) / 100L, (base + 201) / 100L)
  }

  test("mixtureKeep: deterministic, and per-stratum rate tracks the target") {
    import spark.implicits._
    val n = 20000L
    val ids = spark.range(n).toDF("doc_id")
    val kept = ids.where(Packing.mixtureKeep(col("doc_id"), lit(250000L)))
    val c1 = kept.count()
    val c2 = ids.where(Packing.mixtureKeep(col("doc_id"), lit(250000L))).count()
    c1 shouldBe c2
    // 25% target; affine-hash equidistribution should land well within 2%
    math.abs(c1.toDouble / n - 0.25) should be < 0.02
    // monotone: a higher rate keeps a superset
    val hi = ids.where(Packing.mixtureKeep(col("doc_id"), lit(600000L)))
    kept.join(hi, Seq("doc_id"), "left_anti").count() shouldBe 0L
  }

  test("native reservoirKey equals the HOF formulation bit-for-bit") {
    import org.apache.spark.sql.functions._
    val df = spark.range(200).toDF("doc_id")
      .withColumn("w", (col("doc_id") * 37 % 91) + 1)
    val p = 2147483647L
    val m = 2654435761L % p
    val hof = array_max(transform(
      sequence(lit(1L), greatest(col("w").cast("long"), lit(1L))),
      j => pmod(pmod(pmod(col("doc_id").cast("long"), lit(p)) * lit(1000003L) + j,
        lit(p)) * lit(m) + lit(101L), lit(p))))
    val diffs = df.select(
        Packing.reservoirKey(col("doc_id"), col("w")).as("nat"), hof.as("ref"))
      .where(col("nat") =!= col("ref")).count()
    diffs shouldBe 0L
    // weight <= 0 clamps to 1 (single hash), and huge ids do not overflow
    val one = df.sparkSession.range(1).toDF("doc_id")
      .select(Packing.reservoirKey(lit(9007199254740993L), lit(0L)).as("k"))
      .head().getLong(0)
    one should be >= 0L
  }
}
