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
