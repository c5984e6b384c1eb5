package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data assembly operators: deterministic mixture sampling and
  * greedy sequence packing. No reference counterpart — these are the
  * LLM-pipeline extension surface (SURVEY §2 "training-data ops"), the
  * steps that turn a filtered corpus into an actual training mix.
  *
  * Both are designed for the 100 TB shape:
  *  - mixture sampling is a pure per-row codegen predicate (no shuffle,
  *    no RNG state, no sampleBy two-pass) — it runs at parquet-scan speed
  *    and the decision for a row is reproducible from its key alone, so
  *    re-runs, retries and incremental appends keep identical samples;
  *  - packing groups by (source, bounded doc_id chunk) so group memory is
  *    O(chunkSize) regardless of corpus size and parallelism grows with
  *    the data; the greedy fold is sequential ONLY within a chunk, which
  *    is exactly how production packers bound the inherently-sequential
  *    next-fit recurrence.
  */
object Packing {

  /** Deterministic keep-predicate for source-stratified Bernoulli
    * sampling at `ratePpm` parts-per-million: a MINSTD-style affine hash
    * of the row key reduced mod 1e6, compared against the stratum rate.
    * Pure integer arithmetic so an ANSI-SQL oracle reproduces it bit-for-
    * bit (a prod pipeline would use xxhash64(key) — same shape, stronger
    * mixing; the arithmetic hash keeps the DuckDB twin exact).
    *
    * The key is reduced mod p BEFORE the multiply — (key mod p)(m mod p)
    * mod p == key*m mod p, but the reduced product peaks at ~1.1e18 and
    * never overflows Long, where the naive key*2654435761 wraps silently
    * above doc_id ~3.4e9 (and ANSI mode / the SQL twin would error). */
  def sampleHashPpm(key: Column): Column =
    pmod(pmod(key, lit(2147483647L)) * lit(2654435761L % 2147483647L) + lit(101L),
      lit(2147483647L)) % lit(1000000L)

  def mixtureKeep(key: Column, ratePpm: Column): Column =
    sampleHashPpm(key) < ratePpm

  /** Efraimidis–Spirakis weighted-reservoir key, integer-exact: an
    * item with integer weight w gets key = max of w per-(id, j) affine
    * hashes — distributionally identical to the textbook u^(1/w) key
    * (max of w iid uniforms), with NO transcendentals, so the DuckDB
    * twin replays the selection bit-for-bit (ln/pow differ across libms
    * in the last ulp, which is exactly where a top-k boundary sits).
    * Cost is O(w) per item = O(corpus chars) when w is a length — the
    * same order as reading the text once; top-k by (key desc, id) is
    * then a distributed TakeOrdered, no shuffle of payload. Same
    * overflow discipline as [[sampleHashPpm]]: reduce mod p before the
    * multiply so the product peaks at ~1.1e18. */
  def reservoirKey(id: Column, weight: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      graft.functions.ReservoirKeyExpr(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(id.cast("long")),
        org.apache.spark.sql.GraftExpressionBridge.toExpression(weight.cast("long"))))

  /** Deterministic weighted sample without replacement: the `k` items
    * with the largest [[reservoirKey]] (ties by ascending id). */
  def weightedReservoir(df: DataFrame, k: Int, idCol: String = "doc_id",
                        weightCol: String = "n_chars"): DataFrame =
    df.select(col(idCol), col(weightCol),
        reservoirKey(col(idCol), col(weightCol)).as("rkey"))
      .orderBy(col("rkey").desc, col(idCol)).limit(k)

  /** Greedy sequential (next-fit) packing: within each (source,
    * doc_id-chunk) group, documents in doc_id order are packed into
    * shards of at most `budget` tokens; a document that would overflow
    * the CURRENT shard starts a new one (next-fit — earlier shards are
    * never revisited, unlike first-fit), and an oversized document
    * occupies a shard alone. Returns (doc_id, source, chunk, n_tokens,
    * shard) — shard indices restart at 0 per group, so (source, chunk,
    * shard) is the global shard key. */
  def packGreedy(docs: DataFrame, budget: Long, chunkSize: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("source"),
      // integer division: floor(col/chunkSize) is a DOUBLE divide that
      // loses exactness above 2^53; `div` stays exact at any doc_id
      expr(s"CAST(doc_id AS BIGINT) div ${chunkSize}L").as("chunk"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .as[(Long, String, Long, Long)]
    base.groupByKey(r => (r._2, r._3))
      .flatMapGroups { (key: (String, Long), it: Iterator[(Long, String, Long, Long)]) =>
        val (src, ch) = key
        // group size is bounded by chunkSize, so the sort is O(chunkSize
        // log chunkSize) local work — never corpus-sized
        val ds = it.toArray.sortBy(_._1)
        var shard = 0L
        var fill = 0L
        var first = true
        ds.iterator.map { case (id, _, _, nt) =>
          if (first) { fill = nt; first = false }
          else if (fill + nt <= budget) { fill += nt }
          else { shard += 1; fill = nt }
          (id, src, ch, nt, shard)
        }
      }
      .toDF("doc_id", "source", "chunk", "n_tokens", "shard")
  }
}
