package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path (SURVEY §2.8 /
  * the build brief's preference order: custom `Expression` with
  * `doGenCode` over UDFs).
  *
  * The composed-builtin formulation `aggregate(zip_with(x, y, *), 0, +)`
  * allocates an intermediate array per row and walks two lambda closures;
  * at 100 TB of embedding pairs (ANN verify joins, cosine near-dup
  * scoring) that is the inner loop of the whole job. These expressions
  * generate a single fused primitive loop with zero allocation and stay
  * inside whole-stage codegen.
  *
  * Null semantics match the builtin formulation exactly: NULL result when
  * either input is NULL, the lengths differ (zip_with pads with null), or
  * any element is NULL. */
abstract class ArrayPairFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** (x, y, n) -> result, called only with equal-length all-non-null arrays. */
  protected def fold(x: ArrayData, y: ArrayData, n: Int): Double
  /** java source: given arrays `x`,`y` and length `n`, set `result`. */
  protected def foldCode(ctx: CodegenContext, x: String, y: String, n: String,
                         result: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    fold(x, y, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ok = ctx.freshName("ok")
      val result = ctx.freshName("result")
      s"""
         |int $n = $x.numElements();
         |boolean $ok = ($y.numElements() == $n);
         |if ($ok) {
         |  for (int $i = 0; $i < $n && $ok; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) $ok = false;
         |  }
         |}
         |if ($ok) {
         |  double $result = 0.0;
         |  ${foldCode(ctx, x, y, n, result)}
         |  ${ev.value} = $result;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
}

case class ArrayDotProduct(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_dot"

  protected def fold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  protected def foldCode(ctx: CodegenContext, x: String, y: String, n: String,
                         result: String): String = {
    val i = ctx.freshName("i")
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  $result += $x.getDouble($i) * $y.getDouble($i);
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity x.y / (|x| |y|) as one fused loop (three accumulators,
  * one pass, no intermediate arrays). Returns 0 for zero-norm inputs. */
case class ArrayCosineSimilarity(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_cosine"

  protected def fold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom > 0) dot / denom else 0.0
  }

  protected def foldCode(ctx: CodegenContext, x: String, y: String, n: String,
                         result: String): String = {
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val denom = ctx.freshName("denom")
    s"""
       |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $xi = $x.getDouble($i);
       |  double $yi = $y.getDouble($i);
       |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
       |}
       |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
       |$result = $denom > 0.0 ? $dot / $denom : 0.0;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayNumeric {
  private def expr(c: Column): Expression = GraftExpressionBridge.toExpression(c)

  /** x . y over two ARRAY<DOUBLE> columns (native codegen). */
  def dot(x: Column, y: Column): Column =
    GraftExpressionBridge.toColumn(ArrayDotProduct(
      expr(x.cast("array<double>")), expr(y.cast("array<double>"))))

  /** cosine(x, y) over two ARRAY<DOUBLE> columns (native codegen). */
  def cosine(x: Column, y: Column): Column =
    GraftExpressionBridge.toColumn(ArrayCosineSimilarity(
      expr(x.cast("array<double>")), expr(y.cast("array<double>"))))
}
