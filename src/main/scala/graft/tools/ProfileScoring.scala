package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{Scoring, TextFunctions}

/** Scratch profiler for the q98/q103 scoring paths (round 7). */
object ProfileScoring {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    docs.count(); docs.select(explode(split(lower(trim(col("text"))), "\\s+"))).count()
    val grams = docs.select(col("doc_id"),
        explode(TextFunctions.wordShingles(lower(trim(col("text"))), 2)).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
    time("grams.count")(grams.count())
    val big = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    time("big.count")(big.count())
    time("big.collect")(big.collect().length)
    val hashed = docs.select(col("doc_id"),
        explode(TextFunctions.wordShingles(lower(trim(col("text"))), 2)).as("g"))
      .withColumn("b", Scoring.hashBucket(col("g"), 256))
    time("hashed.count")(hashed.count())
    time("hashed.agg")(hashed.groupBy("b").count().collect().length)
    time("full bigramNll")(Scoring.bigramNll(docs).count())
    time("full bigramNll again")(Scoring.bigramNll(docs).count())
    time("full dsir")(Scoring.dsirScores(docs, col("source") === "src0").count())
    time("full dsir again")(Scoring.dsirScores(docs, col("source") === "src0").count())
    spark.stop()
  }
}
