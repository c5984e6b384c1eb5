package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB regime:
  *
  *  - exact dedup: hash-groupBy — one shuffle on a 16-byte key, no document
  *    payload moves if the plan only carries (key, doc_id).
  *  - MinHash+LSH near-dup: per-doc signature is a narrow map-side pass;
  *    candidate generation shuffles (band_hash -> doc_id) pairs only;
  *    verification joins back on doc_id. Nothing is ever all-pairs.
  *  - SimHash: 64-bit signature per doc, banding on 16-bit chunks.
  *  - n-gram Jaccard: exact verify step for candidate pairs.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. Returns
    * (doc_id, fp, keep) where keep = doc_id is the group minimum —
    * the "keep-first" policy of standard corpus dedup. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val w = Window.partitionBy("fp")
    docs.select(col(idCol), fp.as("fp"))
      .withColumn("keep", col(idCol) === min(idCol).over(w))
  }

  /** MinHash signature column: k hashes, each = min over shingles of
    * xxhash64(seed_i || shingle). Pure expression (nested higher-order
    * functions), no UDF. */
  def minhashSignature(text: Column, shingleLen: Int, k: Int): Column = {
    val sh = array_distinct(TextFunctions.shingles(text, shingleLen))
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(concat(i.cast("string"), s)))))
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band. Emits (doc_id, band_idx, band_hash). */
  def lshBands(docs: DataFrame, textCol: String, idCol: String,
               shingleLen: Int = 5, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    docs
      .select(col(idCol), minhashSignature(col(textCol), shingleLen, k).as("sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))).as(Seq("band_idx", "band_hash")))
  }

  /** Candidate near-duplicate pairs from LSH buckets (a < b). The
    * self-join happens per (band_idx, band_hash) bucket — bucket sizes are
    * small by construction, so the join output is ~#true-candidates, not
    * all-pairs. */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", shingleLen: Int = 5,
                        bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val b = lshBands(docs, textCol, idCol, shingleLen, bands, rowsPerBand)
    val l = b.select(col("band_idx"), col("band_hash"), col(idCol).as("a"))
    val r = b.select(col("band_idx"), col("band_hash"), col(idCol).as("b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact character-n-gram Jaccard similarity for given candidate pairs.
    * `pairs` has columns (a, b); docs joined in twice (broadcast when the
    * candidate set is small). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, shingleLen: Int = 5,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(TextFunctions.shingles(col(textCol), shingleLen)).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("a"), col("sh").as("sha")), "a")
      .join(sh.select(col(idCol).as("b"), col("sh").as("shb")), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double")).as("jaccard"))
  }

  /** 64-bit SimHash of whitespace tokens: bit j of the signature is the
    * sign of sum over tokens of (+1 if bit j of xxhash64(token) else -1).
    * Token hashing uses Spark's native xxhash64 for parity with the
    * column-expression ops; the bit-vote loop is a deterministic Scala UDF
    * over the pre-hashed token array (the hash pass stays codegen'd). */
  def simhash(text: Column): Column = {
    val hashes = transform(split(trim(text), "\\s+"), t => xxhash64(t))
    simhashFromHashes(hashes)
  }

  private val simhashUdf = udf { (hs: Seq[Long]) =>
    val votes = new Array[Int](64)
    hs.foreach { h =>
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  def simhashFromHashes(hashes: Column): Column = simhashUdf(hashes)

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: band the 64-bit signature into 4 16-bit
    * chunks; docs sharing any chunk are candidates (Hamming<=3 guaranteed
    * recall by pigeonhole for <=3 differing bits). */
  def simhashCandidates(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol), simhash(col(textCol)).as("sig"))
    val banded = sigs.select(col(idCol), col("sig"), posexplode(
      array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("band_idx", "chunk")))
    val l = banded.select(col("band_idx"), col("chunk"), col(idCol).as("a"), col("sig").as("siga"))
    val r = banded.select(col("band_idx"), col("chunk"), col(idCol).as("b"), col("sig").as("sigb"))
    l.join(r, Seq("band_idx", "chunk")).where(col("a") < col("b"))
      .select(col("a"), col("b"), hamming64(col("siga"), col("sigb")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
