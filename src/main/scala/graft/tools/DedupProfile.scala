package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev profiler for the minhash-LSH dedup pipeline stages. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = time("signatures") {
      val s = Dedup.minhashSignatures(docs, "text", "doc_id", 5, 32); s.count(); s
    }
    val cand = time("candidates") {
      // localCheckpoint: ngramJaccard is candidate-driven and references
      // the pairs frame three times — an unmaterialized frame would
      // re-execute the whole candidate pipeline inside the verify timing
      val c = Dedup.minhashCandidates(docs).localCheckpoint()
      println("  candidates=" + c.count()); c
    }
    time("verify-jaccard") {
      val v = Dedup.ngramJaccard(docs, cand, 5)
      println("  verified=" + v.count())
    }
    time("full-query-q21") {
      println("  rows=" + graft.SparkEntry.queries("q21_minhash_candidates")(spark, dir).count())
    }
    spark.stop()
  }
}
