package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Native array expressions: parity with the composed-builtin formulation,
  * null handling, and codegen path (whole-stage codegen exercises doGenCode
  * at these row counts). */
class ArrayNumericSpec extends SparkSpec with Matchers {

  def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  test("dot and cosine match the builtin formulation exactly") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(7L)
    val df = (0 until 2000).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian()), Seq.fill(16)(rng.nextGaussian()))
    }.toDF("id", "a", "b").cache()
    val cmp = df.select(
      ArrayNumeric.dot(col("a"), col("b")).as("nd"),
      builtinDot(col("a"), col("b")).as("bd"),
      ArrayNumeric.cosine(col("a"), col("b")).as("nc"),
      (builtinDot(col("a"), col("b")) /
        (sqrt(builtinDot(col("a"), col("a"))) * sqrt(builtinDot(col("b"), col("b"))))).as("bc"))
    val mx = cmp.agg(max(abs(col("nd") - col("bd"))), max(abs(col("nc") - col("bc"))))
      .collect()(0)
    mx.getDouble(0) should be < 1e-12
    mx.getDouble(1) should be < 1e-12
  }

  test("null inputs yield null; zero vectors yield cosine 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (2L, None, Some(Seq(1.0, 1.0))),
      (3L, Some(Seq(0.0, 0.0)), Some(Seq(1.0, 1.0)))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), ArrayNumeric.dot(col("a"), col("b")).as("d"),
      ArrayNumeric.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    rows(1L)._1 shouldBe Some(11.0)
    rows(2L)._1 shouldBe None
    rows(2L)._2 shouldBe None
    rows(3L)._2 shouldBe Some(0.0)
  }

  test("interpreted (non-codegen) eval agrees with codegen") {
    // force interpreted path via the expression's eval (typed children:
    // the fold reads elements through the resolved element type now)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val x = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val y = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(4.0, 5.0, 6.0))
    val cx = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType))
    val cy = Literal.create(Seq(4.0, 5.0, 6.0), ArrayType(DoubleType))
    val d = ArrayDotProduct(cx, cy).nullSafeEval(x, y).asInstanceOf[Double]
    d shouldBe 32.0 +- 1e-12
    val c = ArrayCosineSimilarity(cx, cy).nullSafeEval(x, y).asInstanceOf[Double]
    c shouldBe 32.0 / (math.sqrt(14.0) * math.sqrt(77.0)) +- 1e-12
    // typed reads: int8 x float arrays fold without a cast pass
    import org.apache.spark.sql.types.{ByteType, FloatType}
    val bx = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Byte](1, -2, 3))
    val fy = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[Float](4f, 5f, 6f))
    val cb = Literal.create(Seq[Byte](1, -2, 3), ArrayType(ByteType))
    val cf = Literal.create(Seq[Float](4f, 5f, 6f), ArrayType(FloatType))
    val db = ArrayDotProduct(cb, cf).nullSafeEval(bx, fy).asInstanceOf[Double]
    db shouldBe (4.0 - 10.0 + 18.0) +- 1e-12
  }
}
