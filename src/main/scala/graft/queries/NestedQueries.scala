package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Nested

/** q18–q22: nested-document operators (SURVEY P11/J5/A1/A2/F11, the
  * config-stack / connectedEdgeList / rule-array traversals).
  *
  * The synthetic star schema is flat, so each query first BUILDS a
  * nested frame (collect_list of structs, totally ordered via
  * sort_array over a unique struct key — collect_list order is
  * partition-dependent and can never feed a hash-compare directly),
  * then exercises the nested operator, then flattens to a scalar,
  * total-ordered result the DuckDB oracle can state flat-relationally.
  */
object NestedQueries extends QueryPack {

  /** Per-order module array: elements totally ordered by the unique
    * (ln, partkey, qty) triple so every downstream array op is
    * deterministic.
    */
  private def orderModules(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").as("ln"),
        col("l_partkey").as("partkey"),
        col("l_quantity").as("qty"),
        col("l_returnflag").as("name")))).as("modules"))

  def defs: Map[String, Q] = Map(
    // P11: module-by-name lookup — first array element matching a name,
    // as in configuration.enterprise.modules[] traversals.
    "q18_module_lookup" -> Q(
      (s, dir) => orderModules(s, dir)
        .select(
          col("l_orderkey"),
          Nested.moduleByName(col("modules"), "name", "R")
            .getField("qty").cast("double").as("r_qty"),
          size(col("modules")).cast("long").as("n_modules"))
        .orderBy(col("l_orderkey")),
      Some("""SELECT a.l_orderkey, b.r_qty, a.n_modules FROM
        |  (SELECT l_orderkey, count(*) AS n_modules FROM lineitem GROUP BY 1) a
        |LEFT JOIN
        |  (SELECT l_orderkey, CAST(l_quantity AS DOUBLE) AS r_qty FROM
        |     (SELECT l_orderkey, l_quantity,
        |             row_number() OVER (PARTITION BY l_orderkey
        |               ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        |      FROM lineitem WHERE l_returnflag = 'R') t WHERE rn = 1) b
        |USING (l_orderkey)
        |ORDER BY l_orderkey""".stripMargin)),

    // J5: explode an id array into bridge rows with positions, as in
    // gateway connectedEdgeList → gatewayrelation.
    "q19_explode_bridge" -> Q(
      (s, dir) => {
        val withArr = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_partkey").as("partkey")))).as("elems"))
        Nested.explodeBridge(withArr, Seq("l_orderkey"), col("elems"), "elem")
          .select(col("l_orderkey"), col("pos").cast("long").as("pos"),
                  col("elem").getField("partkey").as("l_partkey"))
          .orderBy(col("l_orderkey"), col("pos"))
      },
      Some("""SELECT l_orderkey,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey) - 1 AS pos,
        |  l_partkey
        |FROM lineitem
        |ORDER BY l_orderkey, pos""".stripMargin)),

    // A2 + A11(per-row): exists() over the array + higher-order
    // aggregate() sum — rule-scan flags and per-series totals without
    // leaving whole-stage codegen. Quantities are integral so the
    // double sum is order-exact.
    "q20_nested_exists" -> Q(
      (s, dir) => orderModules(s, dir)
        .select(
          col("l_orderkey"),
          size(col("modules")).cast("long").as("n_items"),
          Nested.existsAny(col("modules"),
            m => m.getField("name") === "R").cast("int").as("any_return"),
          Nested.arraySum(
            transform(col("modules"), m => m.getField("qty")),
            lit(0.0d)).as("total_qty"))
        .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey, count(*) AS n_items,
        |  CAST(max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS INT) AS any_return,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin)),

    // A11 (vector half) + F11: elementwise sum of embedding vectors per
    // label via posexplode + groupBy(pos) — the scale-safe restatement
    // of elementwise list addition. DECIMAL cast makes the float sums
    // exact and order-independent.
    "q21_vector_sum" -> Q(
      (s, dir) => Nested.elementwiseSum(
          Tables.embeddings(s, dir), "label",
          Nested.fillNullZero(col("embedding")),
          // float → double → decimal: Spark's FLOAT→DECIMAL cast goes
          // through double (binary-exact expansion); DuckDB's direct
          // FLOAT→DECIMAL rounds the float's 7-digit shortest repr
          // instead, so the oracle must ALSO cast through DOUBLE.
          _.cast("double").cast(DecimalType(30, 10)))
        .select(col("label"), col("pos").cast("long").as("pos"),
                col("elem_sum").cast("double").as("elem_sum"))
        .orderBy(col("label"), col("pos")),
      // round(double,10) is half-away-from-zero in DuckDB = Spark's
      // HALF_UP decimal cast; DuckDB's own DOUBLE→DECIMAL cast is
      // half-to-even and disagrees on exact-tie floats (m/2^11).
      Some("""SELECT label, pos, CAST(sum(CAST(round(CAST(e AS DOUBLE), 10) AS DECIMAL(30,10))) AS DOUBLE) AS elem_sum
        |FROM (SELECT label,
        |        unnest(list_transform(embedding, x -> coalesce(x, 0))) AS e,
        |        generate_subscripts(embedding, 1) - 1 AS pos
        |      FROM embeddings)
        |GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin)),

    // A1: size(flatten(...)) over a 2-level nested array — static-route
    // counts summed across segments.
    "q22_nested_count" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sort_array(collect_list(col("event_id"))).as("day_events"))
        daily.groupBy(col("user_id"))
          .agg(collect_list(col("day_events")).as("segments"))
          .select(col("user_id"),
            Nested.nestedCount(col("segments")).cast("long").as("n_total"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_total
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin))
  )
}
