package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Aggregates, License}

/** q33–q35: the license/usage/feature-set block (SURVEY A9–A14) over
  * the synthetic star schema — model strings, link series, and config
  * levels are derived deterministically from lineitem/orders so every
  * branch of the reference's chains executes and the DuckDB oracle can
  * restate the logic exactly (including the order-dependent A9
  * recurrence, folded identically in both engines).
  */
object LicenseQueries extends QueryPack {

  private val Models = Seq("edge500", "edge510", "edge520", "edge540",
    "edge610", "edge620", "edge840")

  def defs: Map[String, Q] = Map(
    // A10 + A12 + A13: usage ratios, int-truncated tier bucketing,
    // overcapacity event names.
    "q33_license_usage" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        val agg = li.groupBy(col("l_orderkey")).agg(
          max(col("l_extendedprice")).as("max_ext"),
          sum(Aggregates.dec2(col("l_extendedprice"))).cast("double").as("sum_ext"),
          sum(Aggregates.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("is_hub"))
        val model = element_at(
          array(Models.map(lit): _*), (col("l_orderkey") % 7).cast("int") + 1)
        val licMbps = round(col("max_ext") * 8 / 1000, 3).cast("int")
        val up = License.usagePct(col("sum_ext") * 1000, col("sum_qty") * 1000)
        val down = License.usagePct(col("sum_qty") * 1000000, col("sum_ext"))
        agg.join(o, Seq("l_orderkey"))
          .withColumn("model", model)
          .withColumn("lic_mbps", licMbps)
          .withColumn("up_pct", up)
          .withColumn("down_pct", down)
          .select(
            col("l_orderkey"), col("model"), col("lic_mbps"),
            License.licenseTier(col("model"), col("lic_mbps")).as("license"),
            col("up_pct"), col("down_pct"),
            License.overcapacityEvent(col("model"), col("lic_mbps"),
              col("o_orderstatus") === "O", col("is_hub") === 1,
              col("up_pct"), col("down_pct")).as("event_name"))
          .orderBy(col("l_orderkey"))
      },
      {
        val modelsSql = Models.mkString("['", "', '", "']")
        def overcap(pats: Seq[String], thr: Int) = {
          val in = pats.mkString("('", "', '", "')")
          s"""WHEN lic_mbps > $thr AND o_orderstatus = 'O' AND model IN $in THEN
             |    CASE WHEN is_hub = 1 THEN 'OVERCAPACITY_HUB ' || model || ' over $thr'
             |         WHEN down_pct > 5 OR up_pct > 5 THEN 'OVERCAPACITY_HIGHUSAGE ' || model || ' over $thr' END""".stripMargin
        }
        Some(s"""WITH a AS (
          |  SELECT l_orderkey,
          |    max(l_extendedprice) AS max_ext,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_ext,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS is_hub
          |  FROM lineitem GROUP BY 1),
          |b AS (
          |  SELECT a.*, o_orderstatus,
          |    ($modelsSql)[CAST(l_orderkey % 7 AS INT) + 1] AS model,
          |    CAST(trunc(round(max_ext * 8 / 1000, 3)) AS INT) AS lic_mbps,
          |    CASE WHEN sum_qty * 1000 > 0
          |      THEN least(100.0, (sum_ext * 1000 * 8) / (sum_qty * 1000 * 60 * 60 * 8 * 5) * 100)
          |      ELSE 0.0 END AS up_pct,
          |    CASE WHEN sum_ext > 0
          |      THEN least(100.0, (sum_qty * 1000000 * 8) / (sum_ext * 60 * 60 * 8 * 5) * 100)
          |      ELSE 0.0 END AS down_pct
          |  FROM a JOIN orders ON l_orderkey = o_orderkey)
          |SELECT l_orderkey, model, lic_mbps,
          |  CASE WHEN lic_mbps <= 30 AND model IS NOT NULL AND model <> '' THEN model || '_30M'
          |       WHEN lic_mbps > 30 AND lic_mbps <= 50 THEN model || '_50M'
          |       WHEN lic_mbps > 50 AND lic_mbps <= 100 THEN model || '_100M'
          |       WHEN lic_mbps > 100 AND lic_mbps <= 200 THEN model || '_200M'
          |       WHEN lic_mbps > 200 AND lic_mbps <= 400 THEN model || '_400M'
          |       WHEN lic_mbps > 400 AND lic_mbps <= 1000 THEN model || '_1G'
          |       WHEN lic_mbps > 1000 THEN model || '_5G' END AS license,
          |  up_pct, down_pct,
          |  CASE ${overcap(Seq("edge520", "edge510", "edge500"), 200)}
          |  ${overcap(Seq("edge610"), 350)}
          |  ${overcap(Seq("edge540"), 1000)}
          |  ${overcap(Seq("edge620"), 1500)}
          |  ${overcap(Seq("edge840"), 2000)}
          |  END AS event_name
          |FROM b
          |ORDER BY l_orderkey""".stripMargin)
      }),

    // A9: the exact running weighted score recurrence, folded over a
    // deterministically-ordered per-order score list in both engines.
    "q34_weighted_score" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") =!= "A") // the scoreTx!=0/backup gate analog
        val arr = li.groupBy(col("l_orderkey")).agg(
          sort_array(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_partkey").as("pk"),
            col("l_quantity").as("qty"),
            (col("l_quantity") + col("l_tax") * 10).as("sc")))).as("links"))
        arr.select(
            col("l_orderkey"),
            size(col("links")).cast("long").as("n_links"),
            // No rounding: the fold is bit-identical in both engines,
            // while round(·,6) at 1e9 magnitudes is sub-ulp and
            // disagrees between shortest-repr and exact-expansion
            // rounders. Native codegen fold — proven bit-equal to the
            // interpreted HOF recurrence (WeightedScoreFoldSpec), so
            // the DuckDB list_reduce mirror still hash-matches.
            graft.expressions.WeightedScoreFold.scoreF(
              transform(col("links"), l => l.getField("sc"))).as("score"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH f AS (SELECT * FROM lineitem WHERE l_returnflag <> 'A'),
        |g AS (
        |  SELECT l_orderkey,
        |    list(l_quantity + l_tax * 10
        |         ORDER BY l_linenumber, l_partkey, l_quantity) AS scores,
        |    count(*) AS n_links
        |  FROM f GROUP BY 1)
        |SELECT l_orderkey, n_links,
        |  list_reduce(
        |    list_prepend({'s': CAST(0.0 AS DOUBLE), 'n': 0},
        |      list_transform(scores::DOUBLE[], x -> {'s': x, 'n': 0})),
        |    (acc, x) -> {'s': ((acc.s * acc.n + x.s) * 12.5) / (acc.n + 1),
        |                 'n': acc.n + 1}).s AS score
        |FROM g
        |ORDER BY l_orderkey""".stripMargin)),

    // A14: feature-set flags with the value-based (not null) level
    // fallback: profile level consulted only when all edge-level
    // pb/css/nvs flags are false.
    "q35_feature_set" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        def flag(level: String, cond: org.apache.spark.sql.Column) =
          max(when(col("l_linestatus") === level && cond, 1).otherwise(0))
        val agg = li.groupBy(col("l_orderkey")).agg(
          flag("O", col("l_discount") > 0.04).as("e_pb"),
          flag("O", col("l_tax") > 0.05).as("e_css"),
          flag("O", col("l_quantity") > 45).as("e_nvs"),
          flag("F", col("l_discount") > 0.04).as("p_pb"),
          flag("F", col("l_tax") > 0.05).as("p_css"),
          flag("F", col("l_quantity") > 45).as("p_nvs"),
          flag("O", col("l_shipdate") >= lit("1996-01-01").cast("timestamp")).as("b2b"))
        val (pb, css, nvs) = License.levelFallback(
          (col("e_pb") === 1, col("e_css") === 1, col("e_nvs") === 1),
          (col("p_pb") === 1, col("p_css") === 1, col("p_nvs") === 1))
        agg.select(
            col("l_orderkey"),
            pb.cast("int").as("pb"), css.cast("int").as("css"),
            nvs.cast("int").as("nvs"), col("b2b"),
            License.featureSet(col("b2b") === 1, pb, css, nvs).as("feature_set"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH a AS (
        |  SELECT l_orderkey,
        |    max(CASE WHEN l_linestatus = 'O' AND l_discount > 0.04 THEN 1 ELSE 0 END) AS e_pb,
        |    max(CASE WHEN l_linestatus = 'O' AND l_tax > 0.05 THEN 1 ELSE 0 END) AS e_css,
        |    max(CASE WHEN l_linestatus = 'O' AND l_quantity > 45 THEN 1 ELSE 0 END) AS e_nvs,
        |    max(CASE WHEN l_linestatus = 'F' AND l_discount > 0.04 THEN 1 ELSE 0 END) AS p_pb,
        |    max(CASE WHEN l_linestatus = 'F' AND l_tax > 0.05 THEN 1 ELSE 0 END) AS p_css,
        |    max(CASE WHEN l_linestatus = 'F' AND l_quantity > 45 THEN 1 ELSE 0 END) AS p_nvs,
        |    max(CASE WHEN l_linestatus = 'O' AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' THEN 1 ELSE 0 END) AS b2b
        |  FROM lineitem GROUP BY 1),
        |b AS (
        |  SELECT *, (e_pb = 0 AND e_css = 0 AND e_nvs = 0) AS use_profile FROM a)
        |SELECT l_orderkey,
        |  CAST(CASE WHEN use_profile THEN p_pb ELSE e_pb END AS INT) AS pb,
        |  CAST(CASE WHEN use_profile THEN p_css ELSE e_css END AS INT) AS css,
        |  CAST(CASE WHEN use_profile THEN p_nvs ELSE e_nvs END AS INT) AS nvs,
        |  b2b,
        |  CASE WHEN b2b = 1
        |         OR (CASE WHEN use_profile THEN p_pb ELSE e_pb END) = 1
        |         OR (CASE WHEN use_profile THEN p_css ELSE e_css END) = 1
        |         OR (CASE WHEN use_profile THEN p_nvs ELSE e_nvs END) = 1
        |       THEN 'Premium Subscription' ELSE 'Enterprise Subscription' END AS feature_set
        |FROM b
        |ORDER BY l_orderkey""".stripMargin))
  )
}
