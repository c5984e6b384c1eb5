package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** One-off recall sweep for the q64 IVF parametrization (sf0.01/sf0.1):
  * recall@5 vs brute force as a function of nProbe. */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.where(col("vec_id") % 40 === 0)
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit")).cache()
    brute.count()
    for (nProbe <- Seq(3, 4, 5, 6); nCells <- Seq(8, 16)) {
      val ivf = Similarity.ivfTopK(e, q, k = 5, nCells = nCells, nProbe = nProbe, seed = 42L)
        .select(col("query_id"), col("neighbor_id"))
      val rec = ivf.join(brute, Seq("query_id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("hit"), lit(0L))) / count(lit(1))).as("r"))
        .collect()(0).getDouble(0)
      println(f"RECALL nCells=$nCells nProbe=$nProbe recall=$rec%.4f")
    }
    spark.stop()
  }
}
