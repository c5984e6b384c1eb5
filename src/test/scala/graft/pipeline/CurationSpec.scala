package graft.pipeline

import graft.SparkSpec
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.{Pii, Scoring, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Round-6 curation operators: PII scrub (q94), Gopher gate (q95),
  * Bloom-prefiltered incremental dedup (q96), unigram-LM scoring (q97),
  * DSIR weights (q98), SemDeDup (q99). */
class CurationSpec extends SparkSpec with Matchers {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("Pii counts and redacts emails, IPv4s, and phones in order") {
    val d = docs(Seq(
      (0L, "s", "mail a.b+c@ex-a.co.uk now"),
      (1L, "s", "host 10.0.255.3 and 1.2.3.4 up"),
      (2L, "s", "call 555-123-4567 ok"),
      (3L, "s", "clean text only"),
      (4L, "s", "x@y.io at 8.8.8.8 call 555-000-1111")))
    val out = d.select(col("doc_id"),
      Pii.emailCount(col("text")).as("e"),
      Pii.ipv4Count(col("text")).as("i"),
      Pii.phoneCount(col("text")).as("p"),
      Pii.redact(col("text")).as("r")).orderBy("doc_id").collect()
    out.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq shouldBe
      Seq((1, 0, 0), (0, 2, 0), (0, 0, 1), (0, 0, 0), (1, 1, 1))
    out(0).getString(4) shouldBe "mail <EMAIL> now"
    out(1).getString(4) shouldBe "host <IP> and <IP> up"
    out(2).getString(4) shouldBe "call <PHONE> ok"
    out(3).getString(4) shouldBe "clean text only"
    out(4).getString(4) shouldBe "<EMAIL> at <IP> call <PHONE>"
  }

  test("gopherGate applies rules in first-fail order") {
    val pass = ("the quick brown fox is that it for a good day and " * 5).trim
    val d = docs(Seq(
      (0L, "s", "too short"),                       // too_few_words
      (1L, "s", ("a " * 60).trim),                  // mean len 1 < 3 -> short_words
      (2L, "s", ("antidisestablishmentarianism " * 60).trim), // long_words
      (3L, "s", ("12345 " * 60).trim),              // nonalpha beats no_stopwords? mean len 5 ok, alpha 0
      (4L, "s", pass)))
    val out = d.select(col("doc_id"),
        TextFunctions.gopherGate(col("text")).as("g"))
      .select(col("doc_id"), col("g.keep"), col("g.reason"))
      .orderBy("doc_id").collect()
    out.map(_.getString(2)).toSeq shouldBe
      Seq("too_few_words", "short_words", "long_words", "nonalpha", "pass")
    out.map(_.getInt(1)).toSeq shouldBe Seq(0, 0, 0, 0, 1)
  }

  test("bloomDedupAgainst finds exactly the docs whose text exists in ref") {
    val all = docs((0L until 50L).map(i => (i, "s", s"text ${i % 10}")))
    val ref = all.where(col("doc_id") < 10)   // one doc per distinct text
    val incoming = all.where(col("doc_id") >= 10)
    val hits = Dedup.bloomDedupAgainst(incoming, ref, expectedItems = 100L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    hits.toSeq shouldBe (10L until 50L).toSeq   // every text repeats mod 10
    // disjoint texts -> no hits (Bloom fp are scrubbed by the exact verify)
    val refB = docs((0L until 5L).map(i => (i, "s", s"unique-$i")))
    Dedup.bloomDedupAgainst(incoming, refB, expectedItems = 100L)
      .count() shouldBe 0L
  }

  test("unigramNll: common-word docs score lower than rare-word docs") {
    val d = docs(
      (0L until 20L).map(i => (i, "s", "common common common")) :+
      (100L, "s", "zzyzx qwerty plugh"))
    val out = Scoring.unigramNll(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // all 'common' docs identical; rare doc strictly higher nll
    out(0L) shouldBe out(19L)
    out(100L) should be > out(0L)
    // hand-check doc 0: c(common)=60, T=63, V=4 -> -ln(61/67)
    out(0L) shouldBe (-math.log(61.0 / 67.0) +- 1e-6)
  }

  test("dsirScores: target-like docs score higher than off-target docs") {
    val d = docs(
      (0L until 30L).map(i => (i, "src0", "alpha beta gamma delta")) ++
      (100L until 130L).map(i => (i, "src1", "omega psi chi phi")) :+
      (500L, "src1", "alpha beta gamma delta"))  // target-LIKE, not in target
    val out = Scoring.dsirScores(d, targetPred = col("source") === "src0")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out(500L) shouldBe out(0L)          // same features, same score
    out(500L) should be > out(100L)     // target-like beats off-target
    // single-token doc has no bigrams and drops out
    val d2 = docs(Seq((0L, "src0", "a b"), (1L, "src1", "lone")))
    Scoring.dsirScores(d2, col("source") === "src0")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(0L)
  }

  test("semDedup drops exactly the vectors with an earlier cosine-near neighbor in-cluster") {
    import spark.implicits._
    // two well-separated directions, several near-identical copies of each
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.99f, 0.01f, 0.0f)),
      (2L, Array(0.98f, 0.02f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f)), (11L, Array(0.0f, 0.99f, 0.01f)),
      (20L, Array(0.0f, 0.0f, 1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val res = Similarity.semDedup(df, tau = 0.95, nClusters = 3, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    res(0L) shouldBe 1   // earliest in its direction always kept
    res(10L) shouldBe 1
    res(20L) shouldBe 1  // isolated vector kept
    // copies are dropped IF they landed in the same cluster as their
    // original (3 clusters over 3 directions: they do)
    res(1L) shouldBe 0
    res(2L) shouldBe 0
    res(11L) shouldBe 0
    // determinism across partitionings
    val res2 = Similarity.semDedup(df.repartition(5), tau = 0.95, nClusters = 3, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    res2 shouldBe res
  }
}
