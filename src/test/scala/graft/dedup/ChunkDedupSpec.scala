package graft.dedup

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers

/** Chunk-level dedup: planted repeated word-windows dropped keep-first,
  * docs reassembled in order. */
class ChunkDedupSpec extends SparkSpec with Matchers {

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("repeated chunks drop keep-first and docs reassemble in order") {
    import spark.implicits._
    val boiler = words("b", 4) // a 4-word boilerplate chunk
    val docs = Seq(
      (0L, boiler + " " + words("x", 4)),            // chunks: [boiler, x]
      (1L, boiler + " " + words("y", 4)),            // boiler dup -> dropped
      (2L, words("y", 4) + " " + boiler),            // both chunks dups
      (3L, words("z", 4))                            // unique
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, chunkWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(0L) shouldBe ((2L, 2L, boiler + " " + words("x", 4)))
    out(1L) shouldBe ((2L, 1L, words("y", 4)))
    out(2L) shouldBe ((2L, 0L, ""))
    out(3L) shouldBe ((1L, 1L, words("z", 4)))
  }

  test("a within-doc repeat is also dropped (keep the earlier index)") {
    import spark.implicits._
    val c = words("r", 3)
    val docs = Seq((7L, c + " " + words("m", 3) + " " + c)).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, chunkWords = 3).collect()(0)
    out.getLong(1) shouldBe 3L
    out.getLong(2) shouldBe 2L
    out.getString(3) shouldBe c + " " + words("m", 3)
  }

  test("partial trailing chunk is its own unit") {
    import spark.implicits._
    val docs = Seq((1L, words("a", 5))).toDF("doc_id", "text") // 4+1 words
    val out = Dedup.chunkDedup(docs, chunkWords = 4).collect()(0)
    out.getLong(1) shouldBe 2L
    out.getLong(2) shouldBe 2L
    out.getString(3) shouldBe words("a", 5)
  }

  test("hash-keyed scale variant is bit-identical to the exact-text variant") {
    import spark.implicits._
    // mix of planted boilerplate repeats, within-doc repeats, partial
    // trailing chunks and unique docs — every branch both variants share
    val boiler = words("b", 4)
    val docs = (Seq(
      (0L, boiler + " " + words("x", 4)),
      (1L, boiler + " " + words("y", 4)),
      (2L, words("y", 4) + " " + boiler),
      (3L, words("z", 4)),
      (4L, boiler + " m0 m1 " + boiler + " tail0")
    ) ++ (10L until 60L).map(i => (i, words(s"w${i % 7}_", 11))))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1).toSeq
    canon(Dedup.chunkDedupByHash(docs, chunkWords = 4)) shouldBe
      canon(Dedup.chunkDedup(docs, chunkWords = 4))
  }

  test("hash variant ships no text through its rank/agg shuffles, " +
    "one doc-keyed text exchange total") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, words(s"v${i % 5}_", 9)))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedupByHash(docs, chunkWords = 3)
    out.collect() // execute so the audited plan is the real adaptive one
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val textish = Set("text", "ws", "chunk")
    val textExchanges = graft.tools.ScaleAudit.allPlanNodes(out).count {
      case e: ShuffleExchangeExec => e.output.exists(a => textish(a.name))
      case _ => false
    }
    textExchanges should be <= 1
  }

  test("deterministic across runs") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, words(s"w${i % 7}_", 10))).toDF("doc_id", "text")
    def run() = Dedup.chunkDedup(docs, chunkWords = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    run() shouldBe run()
  }
}
