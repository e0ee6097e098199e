package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: registers the native functions for
  * SQL use (`spark.sql.extensions=graft.expressions.GraftExtensions`
  * or `.withExtensions(new GraftExtensions)`), e.g.
  * `SELECT graft_dot(a.embedding, b.embedding) FROM …`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_weighted_score"),
      new ExpressionInfo(classOf[WeightedScoreFold].getName,
        "graft_weighted_score"),
      GraftExtensions.weightedScoreBuilder))
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

  // StopwordSetCounts is not SQL-registered: its word sets are a
  // Scala-side constructor argument (profiles are code, not data), so
  // the Column API is its only entry point.
}
