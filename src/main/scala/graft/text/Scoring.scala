package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Materialize.FrozenOps

/** Corpus-statistics document scoring for training-data curation:
  * n-gram language-model perplexity filtering (the CCNet/KenLM-style
  * quality signal) and DSIR hashed-n-gram importance weighting
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"). No reference counterpart — LLM-pipeline extension
  * surface.
  *
  * Scale shape (both operators): one explode over the corpus, one
  * aggregation to a model table that is VOCABULARY/BUCKET-sized (not
  * corpus-sized), then a broadcast join back and a per-doc aggregation.
  * The corpus text itself never shuffles — only (id, token-hash) pairs —
  * and the model table is small enough to broadcast at any corpus size
  * (hashed DSIR buckets are fixed-width by construction; a word
  * vocabulary is Zipf-bounded and can be frequency-truncated upstream if
  * it ever outgrows broadcast).
  */
object Scoring {

  /** Lowercased whitespace tokens, one row per occurrence. */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))

  /** Per-document average negative log-likelihood under an add-one-
    * smoothed unigram LM fit on the corpus itself: p(w) = (c(w)+1)/(T+V).
    * Low `avg_nll` ≈ in-distribution text; high ≈ gibberish — the
    * classic perplexity quality filter, self-trained for determinism.
    * Returns (idCol, n_tokens, avg_nll rounded to 6). */
  def unigramNll(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val t = tokens(docs, idCol, textCol)
    val counts = t.groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("t_total"),
      count(lit(1)).as("v"))
    t.join(broadcast(counts), Seq("tok"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(avg(-log((col("c") + lit(1)).cast("double") /
          (col("t_total") + col("v")).cast("double"))), 6).as("avg_nll"))
  }

  /** Per-document average negative log-likelihood under an INTERPOLATED
    * bigram LM fit on the corpus itself — the KenLM-shaped upgrade of
    * [[unigramNll]]: per bigram occurrence (w1, w2),
    *   p(w2 | w1) = lambda * c(w1 w2)/c(w1 *) + (1-lambda) * (c(w2)+1)/(T+V)
    * with MLE bigram probabilities (contexts are always observed when
    * scoring the fitting corpus) linearly interpolated against the
    * add-one-smoothed unigram floor (default lambda = 0.75: both 0.75
    * and 0.25 are exact binary doubles, so a SQL twin's literals match
    * bit-for-bit — 0.7/0.3 would differ in the last ulp between
    * engines). Docs with fewer than 2 tokens have
    * no bigrams and drop out (no evidence — same contract as
    * [[dsirScores]]).
    *
    * Scale shape: the bigram-count model table is the only addition over
    * the unigram path — it is vocabulary-pair-sized (Zipf-bounded, NOT
    * corpus-sized; frequency-truncate upstream if a web-scale vocabulary
    * ever outgrows broadcast) and both model joins are broadcasts, so
    * the corpus again never shuffles: one explode, two bounded
    * aggregations, broadcast joins back, one per-doc aggregation.
    * Returns (idCol, n_bigrams, avg_nll rounded to 6). */
  def bigramNll(docs: DataFrame, lambda: Double = 0.75,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol),
        explode(TextFunctions.wordShingles(lower(trim(col(textCol))), 2)).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
    // materialize the two model tables ONCE: they are vocab(-pair)-sized,
    // so the checkpoint is cheap at any corpus scale, and without it each
    // downstream broadcast build re-runs the corpus-wide explode (the
    // corpus would be scanned ~6x instead of 3x)
    val big = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .frozen()
    val ctx = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val t = tokens(docs, idCol, textCol)
    val uni = t.groupBy("tok").agg(count(lit(1)).as("cu")).frozen()
    val totals = uni.agg(sum(col("cu")).as("t_total"), count(lit(1)).as("v"))
    val pBi = col("c12").cast("double") / col("c1").cast("double")
    val pUni = (col("cu") + lit(1)).cast("double") /
      (col("t_total") + col("v")).cast("double")
    grams.join(broadcast(big), Seq("w1", "w2"))
      .join(broadcast(ctx), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("tok", "w2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(-log(lit(lambda) * pBi + lit(1.0 - lambda) * pUni)), 6).as("avg_nll"))
  }

  /** Engine-portable bucket hash (the q22/q88 md5 pattern: 15 hex chars
    * = 60 bits, exactly reproducible as `('0x'||substr(md5(x),1,15))::BIGINT`
    * in DuckDB). */
  def hashBucket(c: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(nBuckets.toLong))

  /** DSIR importance weight per document: hashed word-bigram features,
    * add-one-smoothed bucket distributions for the TARGET slice vs the
    * RAW corpus, and per-doc score = Σ_occurrences log(p_target/p_raw).
    * High score ⇒ the doc looks like the target domain; resampling by
    * this weight is the DSIR selection step. Returns
    * (idCol, n_grams, score rounded to 6) — docs with fewer than 2
    * tokens have no bigrams and drop out (no features ⇒ no evidence). */
  def dsirScores(docs: DataFrame, targetPred: Column, nBuckets: Int = 256,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol), targetPred.cast("long").as("is_t"),
        explode(TextFunctions.wordShingles(lower(trim(col(textCol))), 2)).as("g"))
      .withColumn("b", hashBucket(col("g"), nBuckets))
    // bucket table is fixed-width (nBuckets rows) — checkpoint it so the
    // totals agg and the broadcast build don't each re-run the corpus
    // explode + md5 bucket hash
    val buckets = grams.groupBy("b").agg(count(lit(1)).as("c_raw"),
      sum(col("is_t")).as("c_t")).frozen()
    val totals = buckets.agg(sum(col("c_raw")).as("t_raw"), sum(col("c_t")).as("t_t"))
    val logRatio =
      log((col("c_t") + lit(1)).cast("double") / (col("t_t") + lit(nBuckets)).cast("double")) -
      log((col("c_raw") + lit(1)).cast("double") / (col("t_raw") + lit(nBuckets)).cast("double"))
    grams.join(broadcast(buckets), Seq("b"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        round(sum(logRatio), 6).as("score"))
  }
}
