package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression, ExpressionInfo, LambdaFunction, Literal, NamedLambdaVariable, Remainder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Kernel-fusion optimizer rule: the PORTABLE shingle-hash
  * composition — `transform(graft_shingles(text, n), s ->
  * graft_md5h60(s) % p)` — rewrites to the fused one-pass
  * [[ShingleHashes]] native kernel whenever it appears in a plan, so
  * a caller (Column API or SQL) who writes the readable composition
  * still executes the fast path. Safe because the two forms are
  * bit-identical (ShingleHashesSpec pins it); the rewrite only fires
  * on the EXACT shape — a lambda whose body is `md5h60(var) % lit`
  * over the lambda's own variable.
  */
object FuseShingleHashes extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayTransform(WordShingles(child, n),
          LambdaFunction(
            Remainder(Md5Hash60(v: NamedLambdaVariable),
              Literal(p: Long, LongType), _),
            Seq(arg: NamedLambdaVariable), _))
          if v.exprId == arg.exprId && p >= 1 =>
        ShingleHashes(child, n, p)
    }
}

/** SparkSessionExtensions wiring: registers the native functions for
  * SQL use (`spark.sql.extensions=graft.expressions.GraftExtensions`
  * or `.withExtensions(new GraftExtensions)`), e.g.
  * `SELECT graft_dot(a.embedding, b.embedding) FROM …`, plus the
  * [[FuseShingleHashes]] kernel-fusion optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseShingleHashes)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_weighted_score"),
      new ExpressionInfo(classOf[WeightedScoreFold].getName,
        "graft_weighted_score"),
      GraftExtensions.weightedScoreBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_ln_ppm"),
      new ExpressionInfo(classOf[LnPpmFx].getName, "graft_ln_ppm"),
      GraftExtensions.lnPpmBuilder))
  }
}

object GraftExtensions {
  val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_dot takes exactly 2 arguments")
    DotProductF(children.head, children(1))
  }

  val weightedScoreBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1,
      "graft_weighted_score takes exactly 1 argument")
    WeightedScoreFold(children.head)
  }

  val lnPpmBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_ln_ppm takes exactly 2 arguments")
    LnPpmFx(children.head, children(1))
  }

  // StopwordSetCounts is not SQL-registered: its word sets are a
  // Scala-side constructor argument (profiles are code, not data), so
  // the Column API is its only entry point.
}
