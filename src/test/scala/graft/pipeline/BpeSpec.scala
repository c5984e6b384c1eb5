package graft.pipeline

import graft.SparkSpec
import graft.text.Bpe
import org.scalatest.matchers.should.Matchers

/** BPE tokenizer train/encode (q100). The tiny corpus is hand-worked:
  * word freqs {low:5, lower:2, newest:6, widest:3} — the classic BPE
  * teaching example. */
class BpeSpec extends SparkSpec with Matchers {

  private val freqs = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromFrequencies follows the hand-worked merge sequence") {
    val (model, trace) = Bpe.trainFromFrequencies(freqs, numMerges = 4)
    // pair counts step 1: es=9 (newest 6 + widest 3), st=9, we=8(6+2), lo=7...
    // es vs st tie at 9 -> lexicographically smaller ("e","s") wins
    trace(0) shouldBe (("e", "s"), 9L)
    // step 2: ("es","t")=9 now the max (st was consumed)
    trace(1) shouldBe (("es", "t"), 9L)
    // step 3: ("w","est")=8? newest: n,e,w,est (6): ("w","est")=6; widest:
    // w,i,d,est (3): ("d","est")=3; lower gives ("l","o")=7, low too ->
    // ("l","o") = 5+2 = 7 beats ("w","est")=6
    trace(2) shouldBe (("l", "o"), 7L)
    trace(3) shouldBe (("lo", "w"), 7L)
    model.merges.size shouldBe 4
  }

  test("encodeWord applies merges by rank and roundtrips") {
    val (model, _) = Bpe.trainFromFrequencies(freqs, numMerges = 4)
    Bpe.encodeWord("newest", model.ranks) shouldBe Vector("n", "e", "w", "est")
    Bpe.encodeWord("lowest", model.ranks) shouldBe Vector("low", "est")
    Bpe.encodeWord("low", model.ranks) shouldBe Vector("low")
    // unseen chars survive as singletons; concat always restores the word
    for (w <- Seq("newest", "lowest", "low", "xyzzy", "wider"))
      Bpe.encodeWord(w, model.ranks).mkString shouldBe w
  }

  test("train + tokenCounts over a DataFrame corpus") {
    import spark.implicits._
    val docs = (
      Seq.fill(5)("low").zipWithIndex.map { case (w, i) => (i.toLong, w) } ++
      Seq.fill(2)("lower").zipWithIndex.map { case (w, i) => (100L + i, w) } ++
      Seq.fill(6)("newest").zipWithIndex.map { case (w, i) => (200L + i, w) } ++
      Seq.fill(3)("widest").zipWithIndex.map { case (w, i) => (300L + i, w) }
    ).toDF("doc_id", "text")
    val (model, _) = Bpe.train(docs, numMerges = 4)
    val counts = Bpe.tokenCounts(docs, model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts(0L) shouldBe 1L        // "low" -> [low]
    counts(100L) shouldBe 3L      // "lower" -> [low, e, r]
    counts(200L) shouldBe 4L      // "newest" -> [n, e, w, est]
    counts(300L) shouldBe 4L      // "widest" -> [w, i, d, est]
  }

  test("invariants: argmax replay, roundtrip, and token-total identity all clean") {
    val (model, trace) = Bpe.trainFromFrequencies(freqs, numMerges = 4)
    val (argmaxViol, roundtripViol, expectedTotal) = Bpe.invariants(freqs, model, trace)
    argmaxViol shouldBe 0L
    roundtripViol shouldBe 0L
    // low->1 tok x5, lower->3 x2, newest->4 x6, widest->4 x3 = 5+6+24+12
    expectedTotal shouldBe 47L
    // a corrupted trace (wrong count) is caught by the replay
    val bad = trace.updated(0, (trace(0)._1, trace(0)._2 + 1))
    Bpe.invariants(freqs, model, bad)._1 should be >= 1L
  }

  test("truncated vocab and determinism across partitionings") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"alpha beta w${i % 7} gamma")).toDF("doc_id", "text")
    val (m1, _) = Bpe.train(docs, numMerges = 6, maxVocab = 5)
    val (m2, _) = Bpe.train(docs.repartition(7), numMerges = 6, maxVocab = 5)
    m1.merges shouldBe m2.merges
  }
}
