package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** int8 quantization accuracy contract: ranking-preserving cosine with
  * bounded error (reference-free op; the 8x-compression ANN path). */
class QuantizeSpec extends SparkSpec {

  test("quantized cosine within 2e-2 of exact at dim 64, elements in [-127, 127]") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "v")
      .withColumn("qv", Similarity.quantizeInt8(col("v")))
    val rangeViol = df.select(
      max(aggregate(col("qv"), lit(0),
        (acc, e) => greatest(acc, abs(e)))).as("m")).collect()(0).getInt(0)
    assert(rangeViol <= 127, s"quantized element out of range: $rangeViol")

    val a = df.select(col("id").as("ia"), col("v").as("va"), col("qv").as("qa"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"), col("qv").as("qb"))
    val err = a.join(b, col("ib") === col("ia") + 1)
      .select(max(abs(Similarity.quantizedCosine(col("qa"), col("qb")) -
        Similarity.cosine(col("va").cast("array<double>"),
          col("vb").cast("array<double>")))).as("e"))
      .collect()(0).getDouble(0)
    assert(err < 0.02, s"quantized cosine error too large: $err")
  }

  test("quantization is exact on the max-magnitude element") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5, -1.0, 0.25))).toDF("id", "v")
      .select(Similarity.quantizeInt8(col("v")).as("q"))
    val q = df.collect()(0).getSeq[Int](0)
    assert(q == Seq(64, -127, 32)) // 0.5/ (1/127) = 63.5 -> 64 (half-away)
  }
}
