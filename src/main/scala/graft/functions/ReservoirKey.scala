package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Loop body of the ES weighted-reservoir key (text/Packing.reservoirKey):
  * max over j in [1, max(weight,1)] of
  *   ((id mod p) * 1000003 + j) mod p * m + 101) mod p
  * with p = 2^31-1 and m = 2654435761 mod p = 506952114 — byte-for-byte
  * the HOF formulation the DuckDB twins replay (q155/q159/q187).
  *
  * The HOF form (`array_max(transform(sequence(...)))`) materializes a
  * weight-length long array per row and walks interpreted lambdas; this
  * runs the loop with zero allocation inside whole-stage codegen — the
  * same class of win as the native shingles (functions/Shingles). */
object ReservoirKeyOps {
  private final val P = 2147483647L
  private final val M = 506952114L

  def key(id: Long, weight: Long): Long = {
    val base = Math.floorMod(id, P) * 1000003L
    val w = math.max(weight, 1L)
    var best = Long.MinValue
    var j = 1L
    while (j <= w) {
      val t = Math.floorMod(Math.floorMod(base + j, P) * M + 101L, P)
      if (t > best) best = t
      j += 1
    }
    best
  }
}

case class ReservoirKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  // analysis-time type contract: a non-long child is an analysis error,
  // never a runtime ClassCastException in nullSafeEval or broken
  // generated code (AbstractDataType is private[sql], so the check is
  // spelled out instead of via ExpectsInputTypes)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"reservoir_key expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(id: Any, weight: Any): Any =
    ReservoirKeyOps.key(id.asInstanceOf[Long], weight.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, w) =>
      s"${ev.value} = graft.functions.ReservoirKeyOps.key($i, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
