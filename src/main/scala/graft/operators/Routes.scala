package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A7: route-table aggregates (`powerbi_main_fun.py:383-428`). */
object Routes {

  /** ROUTE_NUM: count of non-DIRECT preferredExits across subnets
    * (the eligableExits loop in the reference is a no-op — `pass` —
    * and is deliberately NOT reproduced as work). Two-level nested
    * count, zero shuffle.
    */
  def routeNum(subnets: Column): Column =
    coalesce(
      Nested.arraySum(
        transform(subnets, s =>
          coalesce(size(filter(s.getField("preferredExits"),
            // null type counts: Python's `None != "DIRECT"` is True,
            // while a bare =!= would null out and drop the element
            e => coalesce(e.getField("type"), lit("")) =!= "DIRECT")), lit(0))),
        lit(0)),
      lit(0))

  /** ROUTE_CHANGE: subnets whose learnedRoute was modified within the
    * last 1440 minutes of `now` (`minutes = seconds/60 < 1440` ⟺
    * seconds < 86400; second-precision via epoch comparison exactly
    * like the strftime('%s') subtraction).
    */
  def routeChange(subnets: Column, now: Column): Column =
    coalesce(
      size(filter(subnets, s => {
        val modified = graft.functions.Dates.parseIso(
          s.getField("learnedRoute").getField("modified"))
        s.getField("learnedRoute").isNotNull &&
          (unix_timestamp(now) - unix_timestamp(modified)) < 86400L
      })),
      lit(0))
}
