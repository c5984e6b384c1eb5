package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.scalatest.matchers.should.Matchers

/** Value-parity of the round-7 native shingle expressions against the
  * original higher-order-function formulations they replaced (which stay
  * here as executable specifications). */
class ShinglesSpec extends SparkSpec with Matchers {

  // the pre-round-7 HOF formulations, verbatim
  private def hofCharShingles(c: Column, n: Int): Column =
    when(F.length(c) >= n,
      transform(sequence(lit(1), F.length(c) - lit(n - 1)), i => c.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  private def hofWordShingles(c: Column, n: Int): Column = {
    val toks = split(trim(c), "\\s+")
    when(F.size(toks) >= n,
      transform(sequence(lit(0), F.size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
  private def hofWindowMd5(c: Column, k: Int): Column = {
    val words = filter(split(c, " "), w => w =!= "")
    val nw = F.size(words)
    val idxs = when(nw >= k, sequence(lit(1), nw - (k - 1))).otherwise(
      array().cast("array<int>"))
    transform(idxs, i =>
      substring(md5(concat_ws(" ", slice(words, i, lit(k)))), 1, 16))
  }

  private val samples: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab ", "word like text ", "  tabs\tand\nnewlines ",
      "café naïve 你好世界 ", "x")
    val gen = (0 until 200).map { i =>
      val alpha = alphabets(i % alphabets.length)
      (0 until rnd.nextInt(40)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    gen ++ Seq("", " ", "   ", "a", "a b", "\ta b\t", "one two three four five",
      "éééé", "a  b   c", " lead", "trail ")
  }

  private def df = {
    import spark.implicits._
    samples.toDF("text")
  }

  test("CharShingles matches the HOF formulation on random + edge inputs") {
    for (n <- Seq(1, 2, 5)) {
      val rows = df.select(
        graft.text.TextFunctions.shingles(col("text"), n).as("native"),
        hofCharShingles(col("text"), n).as("hof")).collect()
      rows.foreach { r => r.getSeq[String](0) shouldBe r.getSeq[String](1) }
    }
  }

  test("WordShingles matches the HOF formulation on random + edge inputs") {
    for (n <- Seq(1, 2, 3)) {
      val rows = df.select(
        graft.text.TextFunctions.wordShingles(col("text"), n).as("native"),
        hofWordShingles(col("text"), n).as("hof")).collect()
      rows.foreach { r => r.getSeq[String](0) shouldBe r.getSeq[String](1) }
    }
  }

  test("ShingleXxhashes matches transform(shingles, xxhash64)") {
    for (n <- Seq(2, 5, 8)) {
      val rows = df.select(
        Shingles.charHashes(col("text"), n).as("native"),
        transform(hofCharShingles(col("text"), n), s => xxhash64(s)).as("hof"))
        .collect()
      rows.foreach { r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1) }
    }
  }

  test("WordWindowMd5 matches the HOF substring(md5(...)) formulation") {
    for (k <- Seq(1, 2, 4)) {
      val rows = df.select(
        Shingles.wordWindowMd5(col("text"), k, 16).as("native"),
        hofWindowMd5(col("text"), k).as("hof")).collect()
      rows.foreach { r => r.getSeq[String](0) shouldBe r.getSeq[String](1) }
    }
  }

  test("native shingles survive UnsafeRow buffer reuse (owned bytes)") {
    import spark.implicits._
    // many rows through one scan task: if slices referenced a reused scan
    // buffer, later rows would corrupt earlier collected arrays
    val d = (0 until 2000).map(i => s"row$i " * 6).toDF("text").repartition(1)
    val out = d.select(graft.text.TextFunctions.shingles(col("text"), 4).as("s"))
      .collect()
    out.zipWithIndex.foreach { case (r, i) =>
      r.getSeq[String](0).head shouldBe s"row$i".take(4)
    }
  }
}
