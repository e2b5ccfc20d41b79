package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.DotProductFloat

/** Optimizer rule: rewrite the portable higher-order dot-product pattern
  *
  *   aggregate(zip_with(transform(a, x -> double(x)),
  *                      transform(b, x -> double(x)), (x, y) -> x * y),
  *             0.0d, (acc, x) -> acc + x)
  *
  * into the native codegen'd [[DotProductFloat]] — semantically exact
  * (same element casts, same left-to-right double accumulation; IEEE
  * addition/multiplication are commutative, so operand order in the
  * lambdas is irrelevant), ~12x faster, and users who write the portable
  * built-in composition get the fast path without knowing it exists.
  *
  * This is the SURVEY.md §4 threshold for custom Catalyst machinery: a
  * rewrite the stock optimizer cannot see (it does not CSE or fuse through
  * lambda scopes), attached non-invasively via SparkSessionExtensions.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isCastToDouble(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(c: Cast, Seq(v: NamedLambdaVariable), _) =>
      c.child == v && c.dataType == DoubleType
    case _ => false
  }

  private def isVarProduct(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable,
        y: NamedLambdaVariable, _), Seq(a, b), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isVarSum(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable,
        _), Seq(a, b), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isIdentity(lf: Expression): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a), _) =>
      v.exprId == a.asInstanceOf[NamedLambdaVariable].exprId
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(ArrayTransform(a, ca: LambdaFunction),
                  ArrayTransform(b, cb: LambdaFunction),
                  prod: LambdaFunction),
          Literal(0.0, DoubleType),
          merge: LambdaFunction,
          finish)
        if isFloatArray(a) && isFloatArray(b) &&
           isCastToDouble(ca) && isCastToDouble(cb) &&
           isVarProduct(prod) && isVarSum(merge) && isIdentity(finish) =>
        DotProductFloat(a, b)
    }
}

/** Session extensions: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * registers the rewrite rule and the `graft_dot` SQL function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProductFloat(exprs.head, exprs(1))))
    // float-vector × double-vector (centroid scoring) for SQL users
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_fd"),
      new ExpressionInfo(classOf[graft.functions.DotFloatDouble].getName,
        "graft_dot_fd"),
      (exprs: Seq[Expression]) =>
        graft.functions.DotFloatDouble(exprs.head, exprs(1))))
    // z-order / bloom / kmv for SQL users (sketch params must be literals,
    // like every SQL aggregate's shape parameters)
    def litInt(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(s"$what must be an " +
        s"integer literal, got ${e.sql}")
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[graft.functions.InterleaveBits16].getName,
        "graft_zorder"),
      (exprs: Seq[Expression]) =>
        graft.functions.InterleaveBits16(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[graft.functions.HilbertIndex2D8].getName,
        "graft_hilbert"),
      (exprs: Seq[Expression]) =>
        graft.functions.HilbertIndex2D8(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContain].getName,
        "graft_bloom_contains"),
      (exprs: Seq[Expression]) => graft.functions.BloomMightContain(
        exprs.head, exprs(1), litInt(exprs(2), "numHashes"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[graft.functions.BloomAgg].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => graft.functions.BloomAgg(exprs.head,
        litInt(exprs(1), "numBits"), litInt(exprs(2), "numHashes"))
        .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmin"),
      new ExpressionInfo(classOf[graft.functions.KMinValuesAgg].getName,
        "graft_kmin"),
      (exprs: Seq[Expression]) =>
        graft.functions.KMinValuesAgg(exprs.head, litInt(exprs(1), "k"))
          .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.TopKAgg].getName,
        "graft_topk"),
      (exprs: Seq[Expression]) =>
        graft.functions.TopKAgg(exprs.head, exprs(1),
          litInt(exprs(2), "k")).toAggregateExpression()))
  }
}
