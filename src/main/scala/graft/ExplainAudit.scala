package graft


/** Dev tool: per-query physical-plan audit — shuffle/broadcast/codegen
  * counts and scan pushdown lines. Run after adding an operator; a
  * query whose scan reads all columns for a narrow projection, or
  * that shuffles more than its groupBy/join structure requires, is a
  * plan bug even when CORRECTNESS is green.
  *
  * Usage: tools/run.sh graft.ExplainAudit [sfDir] [queryName...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.localBuilder("4")
      // static plan shape: AQE's un-finalized wrapper hides codegen
      // stages and final exchanges; production paths keep AQE on
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      // ONE construction per query: eager queries (sink round-trips)
      // run their side effects at build time, and planning isn't free
      val qe = fn(spark, sfDir).queryExecution
      val plan = qe.executedPlan.toString
      val lines = plan.linesIterator.toSeq
      val shuffles = lines.count(_.contains("Exchange hashpartitioning")) +
        lines.count(_.contains("Exchange rangepartitioning"))
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      // any cartesian is a scale-killer unless one side is provably
      // tiny; BroadcastNestedLoopJoin is counted too (it's the
      // broadcast-side cartesian Spark picks for non-equi joins)
      val cartesians = lines.count(_.contains("CartesianProduct")) +
        lines.count(_.contains("BroadcastNestedLoopJoin"))
      // codegen stages render as "*(n)" prefixes in the plan string
      val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val pushed = lines.filter(_.contains("PushedFilters: [")).map(_.trim.take(120))
      // expression-level audit: count evaluations of a named expression
      // class across the whole physical plan (e.g. RegExpCount — used
      // to prove the q26/q41 counts-once restructuring holds in the
      // final plan, where a toString-based count would truncate)
      val exprCounts = sys.env.get("SPARK_GRAFT_COUNT_EXPR").map { cls =>
        var n = 0
        qe.executedPlan.foreach { node =>
          node.expressions.foreach(_.foreach { e =>
            if (e.getClass.getSimpleName == cls) n += 1
          })
        }
        s" $cls=$n"
      }.getOrElse("")
      // interpreted-expression audit: CodegenFallback nodes break
      // whole-stage codegen around them — list the classes so hot-path
      // offenders are visible (the DotProductF/WeightedScoreFold
      // candidates of the next round)
      val fallbacks = if (sys.env.contains("SPARK_GRAFT_LIST_FALLBACK")) {
        val found = scala.collection.mutable.SortedSet.empty[String]
        qe.executedPlan.foreach { node =>
          node.expressions.foreach(_.foreach {
            case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
              found += e.getClass.getSimpleName
            case _ => ()
          })
        }
        if (found.isEmpty) "" else s" fallback=[${found.mkString(",")}]"
      } else ""
      println(s"== $name: shuffles=$shuffles broadcasts=$broadcasts " +
        s"cartesians=$cartesians codegenSpans=$codegen$exprCounts$fallbacks")
      pushed.distinct.take(3).foreach(l => println(s"   $l"))
    }
    spark.stop()
  }
}
