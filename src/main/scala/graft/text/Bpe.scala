package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Materialize.FrozenOps

import scala.collection.mutable

/** Byte-pair-encoding tokenizer: distributed training + encoding, the
  * missing "actual tokenizer" piece of the token-counting family (q17/q53
  * count whitespace/pretokens; this LEARNS a subword vocabulary). No
  * reference counterpart — LLM-pipeline extension surface.
  *
  * Scale design (the shape every production tokenizer trainer uses —
  * corpus statistics distributed, merge loop local):
  *  - ONE corpus scan reduces the text to a WORD-FREQUENCY table; the
  *    merge loop never touches the corpus again. The word table is
  *    Zipf-bounded (~millions of distinct words for a 100 TB crawl) and
  *    is further truncated to the `maxVocab` most frequent words with a
  *    deterministic (count desc, word asc) order, so it collects to the
  *    driver at any corpus size.
  *  - The k-merge training loop runs driver-side over the word table:
  *    each iteration is O(vocab * avg_word_len) local work — a 100 TB
  *    corpus and a 100 GB corpus with the same vocabulary train at the
  *    SAME speed after the scan.
  *  - Encoding broadcasts the merge-rank table (k entries) and runs
  *    map-side with a per-partition word→tokens memo (words repeat;
  *    Zipf says the memo hit rate approaches 1), so encode is one
  *    shuffle-free scan at parquet speed.
  *
  * Determinism contract (what makes the train reproducible anywhere):
  * ties in the pair-count argmax break on the lexicographically SMALLEST
  * (left, right) pair; the word table is truncated by (count desc, word
  * asc); characters are Unicode code points of the lowercased text.
  */
object Bpe {

  /** Ordered merge list; rank = position. */
  final case class Model(merges: IndexedSeq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    def vocabSize(baseChars: Int): Int = baseChars + merges.size
  }

  /** Split a word into single-code-point symbols. */
  private[text] def chars(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  private def mergeOnce(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The one tokenize/filter/group pipeline both frequency entry points
    * share — a tokenization tweak must reach them together or the q100
    * anchor identity between the training table and the totals breaks. */
  private[graft] def groupedWords(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** The distributed step: lowercased whitespace word frequencies,
    * truncated deterministically to the `maxVocab` most frequent. */
  def wordFrequencies(docs: DataFrame, maxVocab: Int,
                      textCol: String = "text"): Array[(String, Long)] =
    groupedWords(docs, textCol)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Driver-side merge loop over a word-frequency table. Returns the
    * model plus the per-step (pair, count) trace for invariant checks. */
  def trainFromFrequencies(wordFreq: Array[(String, Long)], numMerges: Int):
      (Model, IndexedSeq[((String, String), Long)]) = {
    var words: Array[(Vector[String], Long)] =
      wordFreq.map { case (w, c) => (chars(w), c) }
    val merges = IndexedSeq.newBuilder[(String, String)]
    val trace = IndexedSeq.newBuilder[((String, String), Long)]
    var done = false
    var step = 0
    while (step < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax by count; ties -> lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += best._1
        trace += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best._1), c) }
        step += 1
      }
    }
    (Model(merges.result()), trace.result())
  }

  /** `wordFrequencies` plus the UNTRUNCATED corpus totals
    * (distinct-word count, total word occurrences) from the same single
    * scan — the grouped table is materialized once (localCheckpoint), so
    * the totals stay exact even when the returned word table is
    * maxVocab-truncated. Use this when anchors must match an external
    * full-corpus count. */
  def wordFrequenciesWithTotals(docs: DataFrame, maxVocab: Int,
                                textCol: String = "text"):
      (Array[(String, Long)], Long, Long) = {
    val grouped = groupedWords(docs, textCol).frozen()
    val t = grouped.agg(count(lit(1)).cast("long").as("nd"),
      sum(col("c")).cast("long").as("tot")).collect()(0)
    val wf = grouped.orderBy(col("c").desc, col("w").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (wf, t.getLong(0), t.getLong(1))
  }

  def train(docs: DataFrame, numMerges: Int, maxVocab: Int = 65536,
            textCol: String = "text"): (Model, IndexedSeq[((String, String), Long)]) =
    trainFromFrequencies(wordFrequencies(docs, maxVocab, textCol), numMerges)

  /** Standard BPE apply: repeatedly merge the lowest-rank adjacent pair. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = chars(word)
    var cont = syms.length > 1
    while (cont) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i + 1 < syms.length) {
        val p = (syms(i), syms(i + 1))
        ranks.get(p).foreach { r => if (r < bestRank) { bestRank = r; bestPair = p } }
        i += 1
      }
      if (bestPair == null) cont = false
      else {
        syms = mergeOnce(syms, bestPair)
        if (syms.length < 2) cont = false
      }
    }
    syms
  }

  /** Battery invariants for the oracle gate (the q71/q73/q99 pattern):
    * replays the merge trace over the word table and returns
    * (argmaxViolations, roundtripViolations, expectedTotalTokens):
    *  - a traced merge is a violation unless its recomputed pair count
    *    matches AND attains the maximum over all pairs at that step;
    *  - a vocabulary word is a violation unless its encoded tokens
    *    concatenate back to the word (lossless-ness);
    *  - expectedTotalTokens = Σ freq·|encode(word)| predicts the corpus
    *    total that the distributed `tokenCounts` scan must reproduce
    *    (valid when the word table is untruncated). */
  def invariants(wordFreq: Array[(String, Long)], model: Model,
                 trace: IndexedSeq[((String, String), Long)]): (Long, Long, Long) = {
    var words: Array[(Vector[String], Long)] =
      wordFreq.map { case (w, c) => (chars(w), c) }
    var argmaxViol = 0L
    trace.foreach { case (pair, c) =>
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, wc) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + wc)
          i += 1
        }
      }
      if (counts.getOrElse(pair, -1L) != c || counts.valuesIterator.max != c)
        argmaxViol += 1
      words = words.map { case (syms, wc) => (mergeOnce(syms, pair), wc) }
    }
    var roundtripViol = 0L
    var expectedTotal = 0L
    wordFreq.foreach { case (w, c) =>
      val toks = encodeWord(w, model.ranks)
      if (toks.mkString != w) roundtripViol += 1
      expectedTotal += c * toks.length
    }
    (argmaxViol, roundtripViol, expectedTotal)
  }

  /** Per-document BPE token counts: one map-side scan with a broadcast
    * rank table and a per-partition word→length memo (Zipf ⇒ the memo
    * absorbs nearly all encode work at corpus scale). */
  def tokenCounts(docs: DataFrame, model: Model, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    val base = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    base.mapPartitions { it =>
      val ranks = bc.value
      val memo = mutable.HashMap.empty[String, Int]
      it.map { case (id, text) =>
        var n = 0L
        // Locale.ROOT: must match Spark's locale-independent lower() used
        // in wordFrequencies (default-locale toLowerCase diverges under
        // e.g. tr_TR: "I" -> dotless i), or encode-side words miss the
        // trained vocabulary.
        text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").foreach { w =>
          if (w.nonEmpty)
            n += memo.getOrElseUpdate(w, encodeWord(w, ranks).length)
        }
        (id, n)
      }
    }.toDF(idCol, "n_tokens_bpe")
  }
}
