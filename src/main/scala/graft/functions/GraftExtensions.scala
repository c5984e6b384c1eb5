package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, ExpressionInfo, LambdaFunction, Literal,
  Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst integration surface (SURVEY §2.8 "UDF / UDAF surface ->
  * Catalyst mapping"; the build brief's extension ladder):
  *
  *  - SQL function registration: `array_dot` / `array_cosine` become
  *    callable from `spark.sql(...)` exactly like built-ins.
  *  - `DotProductRewrite`, a `Rule[LogicalPlan]` injected into the
  *    optimizer: rewrites the composed-builtin pattern
  *    `aggregate(zip_with(x, y, (a,b) -> a*b), 0.0D, (acc,v) -> acc+v)`
  *    into the fused native [[ArrayDotProduct]] — every existing query
  *    written against the builtin formulation (kernel distances,
  *    hyperplane projections) gets the allocation-free loop without a
  *    code change.
  *
  * Register with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("array_cosine"),
      new ExpressionInfo(classOf[ArrayCosineSimilarity].getName, "array_cosine"),
      (children: Seq[Expression]) => ArrayCosineSimilarity(children(0), children(1))))
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectOptimizerRule(_ => LevenshteinBandRewrite)
  }
}

/** Optimizer rule: a thresholded Levenshtein comparison
  * `levenshtein(a, b) <= t` (or `<`, or the flipped `>=`/`>` forms)
  * computes the FULL O(|a|*|b|) DP only to compare against a constant.
  * The banded 3-arg form costs O(t*|a|) and early-exits, returning -1
  * above the threshold — so the predicate rewrites to
  * `levenshtein(a, b, t) >= 0`. For a fuzzy-join verify at t=8 over
  * ~300-char docs that is a ~20x kernel. Only fires on a foldable
  * non-negative integer threshold and a 2-arg levenshtein (an explicit
  * threshold means the caller already banded it — and may want the
  * -1 sentinel). */
object LevenshteinBandRewrite extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{
    GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Not}
  import org.apache.spark.sql.types.IntegerType

  // threshold >= 1: Spark's banded Levenshtein requires a positive
  // threshold, and lev <= 0 is better written as string equality anyway
  private object IntThreshold {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) if v >= 1 => Some(v)
      case _ => None
    }
  }

  private def banded(l: Levenshtein, t: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(l.left, l.right, Some(Literal(t))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= t  ===  lev(a,b,t) >= 0
      case LessThanOrEqual(l @ Levenshtein(_, _, None), IntThreshold(t)) =>
        banded(l, t)
      case GreaterThanOrEqual(IntThreshold(t), l @ Levenshtein(_, _, None)) =>
        banded(l, t)
      // lev(a,b) < t  ===  lev(a,b,t-1) >= 0   (banded threshold >= 1)
      case LessThan(l @ Levenshtein(_, _, None), IntThreshold(t)) if t >= 2 =>
        banded(l, t - 1)
      case GreaterThan(IntThreshold(t), l @ Levenshtein(_, _, None)) if t >= 2 =>
        banded(l, t - 1)
      // lev(a,b) > t  ===  NOT (lev(a,b,t) >= 0)
      case GreaterThan(l @ Levenshtein(_, _, None), IntThreshold(t)) =>
        Not(banded(l, t))
      case LessThan(IntThreshold(t), l @ Levenshtein(_, _, None)) =>
        Not(banded(l, t))
    }
}

/** Optimizer rule: fuse `aggregate(zip_with(x, y, *), 0.0, +)` into
  * [[ArrayDotProduct]] when both sides are ARRAY<DOUBLE>. Only fires on
  * the exact shape (multiply lambda, zero double seed, add merge,
  * identity finish), so any other fold is left untouched. */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MultiplyLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
        (a.exprId == x.exprId && b.exprId == y.exprId) ||
          (a.exprId == y.exprId && b.exprId == x.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
        (a.exprId == acc.exprId && b.exprId == v.exprId) ||
          (a.exprId == v.exprId && b.exprId == acc.exprId)
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        body.exprId == arg.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(x, y, mult),
        Literal(0.0, DoubleType),
        merge,
        finish)
      if MultiplyLambda.unapply(mult) && AddLambda.unapply(merge) &&
        IdentityLambda.unapply(finish) && isDoubleArray(x) && isDoubleArray(y) =>
      ArrayDotProduct(x, y)
  }
}
