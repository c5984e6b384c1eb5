package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Recall audit for the q21 minhash banding at BENCH scale (sf0.1): the
  * exact >=0.6-jaccard pair set via shingle co-occurrence vs the banding
  * candidates. Measured: 256 planted pairs at sf0.1, zero missed by the
  * 8x5 banding (and 25/25 caught at sf0.01) — the oracle-equivalence
  * assumption holds an order of magnitude above the correctness gate. */
object Q21Sf01 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // exact >= 0.6 pairs via shingle co-occurrence (the oracle's shape)
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(graft.text.TextFunctions.shingles(col("text"), 5))).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("ni"))
    val exact = inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .where(col("ni").cast("double") / (col("na") + col("nb") - col("ni")) >= 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = graft.dedup.Dedup.minhashCandidates(docs, bands = 8, rowsPerBand = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[q21sf01] exact pairs >= 0.6: ${exact.size}; missed by banding: ${(exact -- cand).size}")
    spark.stop()
  }
}
