package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the q21/q76 minhash->verify->CC pipeline at sf0.1:
  * isolates candidate generation, the (candidate-driven) verify join, and
  * the connected-components rounds to attribute bench movement. */
object DedupPhase {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    docs.count() // warm scan
    val cand = t("candidates+checkpoint") {
      graft.dedup.Dedup.minhashCandidates(docs, bands = 8, rowsPerBand = 5)
        .localCheckpoint()
    }
    println(s"[phase] n_candidates = ${cand.count()}")
    val verified = t("verify(semi-join)") {
      graft.dedup.Dedup.ngramJaccard(docs, cand, 5)
        .where(col("jaccard") >= 0.6).select("a", "b").localCheckpoint()
    }
    println(s"[phase] n_verified = ${verified.count()}")
    t("cc") {
      graft.dedup.Dedup.duplicateClusters(verified).count()
    }
    // old-shape verify: full-corpus shingle frame, no semi-join
    val sh = docs.select(col("doc_id"),
      array_distinct(transform(
        graft.text.TextFunctions.shingles(col("text"), 5), s => xxhash64(s))).as("sh"))
    t("verify(full, old shape)") {
      cand.join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
        .where((size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double")) >= 0.6)
        .count()
    }
    spark.stop()
  }
}
