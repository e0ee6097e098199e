package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation operators (SURVEY §2.5).
  *
  * The reference computes every aggregate with Python accumulation loops
  * over fetched lists (`powerbi_main_fun.py:1532-1600,2034-2061,286-352`).
  * Here each is a single `groupBy(...).agg(...)` — partial (map-side)
  * aggregation happens automatically, so at 100 TB only the per-group
  * partials shuffle, never the raw rows.
  *
  * Numeric policy: monetary doubles are cast to DECIMAL before summing so
  * aggregation is exact and order-independent (a double sum's low bits
  * depend on partition order — unacceptable for a correctness-gated
  * engine); the exact decimal result is cast back to DOUBLE at the end,
  * which is a single deterministic conversion.
  */
object Aggregates {

  /** Exact money: cast to DECIMAL(18,2) pre-aggregation. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact small ratio (discount/tax-like): DECIMAL(8,4). */
  def dec4(c: Column): Column = c.cast(DecimalType(8, 4))

  /** Pricing-summary style conditional-sum aggregate (A1/A5/A8 analog,
    * `powerbi_main_fun.py:1532-1600,2034-2061`): grouped filtered sums +
    * counts over the fact table. One pass, map-side combinable.
    */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(shipBefore).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(8, 4)) - dec4(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Customer-level boolean rollups (A19/J7,
    * `powerbi_main_fun.py:286-352`, `fun_mysql_query.py:115-126`): the
    * reference issues one SQL probe per flag per customer, with INVERTED
    * semantics — the probe returns rows when any edge matches, and the
    * caller sets the flag when NO row comes back. We reproduce that as a
    * single grouped pass: `noneMatch = max(when(cond,1)) is-null-or-0`.
    * Named `no_<flag>` so the inversion stays explicit (SURVEY §7.4.3).
    */
  def booleanRollups(df: DataFrame, key: String,
      flags: Seq[(String, Column)]): DataFrame = {
    val anyAggs = flags.map { case (name, cond) =>
      max(when(cond, 1).otherwise(0)).as(s"any_$name")
    }
    val grouped = df.groupBy(col(key)).agg(anyAggs.head, anyAggs.tail: _*)
    val withNone = flags.foldLeft(grouped) { case (d, (name, _)) =>
      d.withColumn(s"no_$name", (col(s"any_$name") === 0).cast("int"))
    }
    withNone.orderBy(col(key))
  }

  /** Range bucketizer (A3/A12, `powerbi_main_fun.py:1347-1381,2072-2088`):
    * classify a measure into labelled buckets via an ordered when-chain,
    * then count per bucket. The reference's chain has no else branch
    * (SURVEY §7.4.7); we define the explicit fallback label.
    */
  def bucketize(measure: Column,
      buckets: Seq[(Double, String)], fallback: String): Column = {
    val chain = buckets.foldLeft(Option.empty[Column]) {
      case (None, (ub, label))      => Some(when(measure <= ub, label))
      case (Some(c), (ub, label))   => Some(c.when(measure <= ub, label))
    }
    chain.get.otherwise(fallback)
  }

  /** A6 `last`-seen value (`powerbi_main_fun.py:354-380`: Customer
    * Version = buildNumber of the LAST connected edge the loop saw).
    * Iteration order is not reproducible distributed, so the order is
    * made explicit: the value at the maximum of `order` — `max_by`,
    * one-pass and merge-safe. Use a unique order column.
    */
  def lastBy(value: Column, order: Column): Column = max_by(value, order)

  /** Exact sufficient statistics for per-group correlation between two
    * INTEGER features: n, Σx, Σy, Σx², Σy², Σxy and the covariance
    * numerator n·Σxy − Σx·Σy — every term a BIGINT, so the feature-
    * drift audit is order-free and oracle-exact. Pearson r itself
    * needs a sqrt (engine-divergent doubles); callers derive it from
    * these exact sums, or compare r² = num²/(varx·vary) in whatever
    * precision they accept. One partial agg; null feature rows are
    * excluded pairwise (both features must be present to contribute).
    */
  def corrStats(df: DataFrame, groupCol: String, x: Column, y: Column)
      : DataFrame =
    df.filter(x.isNotNull && y.isNotNull)
      .select(col(groupCol), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"), sum(col("__y")).as("sum_y"),
        sum(col("__x") * col("__x")).as("sum_xx"),
        sum(col("__y") * col("__y")).as("sum_yy"),
        sum(col("__x") * col("__y")).as("sum_xy"))
      .withColumn("cov_num", expr("n * sum_xy - sum_x * sum_y"))

  /** Grouped max + count + conditional count (A6/A7,
    * `powerbi_main_fun.py:354-428`): per-group max of a size-like measure
    * and counts under a time predicate — e.g. ROUTE_CHANGE = count of
    * routes modified within a window.
    */
  def groupStats(df: DataFrame, key: String, measure: Column,
      recent: Column): DataFrame =
    df.groupBy(col(key)).agg(
        max(measure).as("max_measure"),
        count(lit(1)).as("n_rows"),
        // count(when(...)) not sum(when(...)): both engines type a
        // conditional COUNT as BIGINT, whereas DuckDB types SUM(int) as
        // HUGEINT — a schema mismatch in the oracle compare.
        count(when(recent, 1)).as("n_recent"))
      .orderBy(col(key))

  /** Leave-one-out target encoding — the categorical featurizer that
    * replaces a category with the mean label of the OTHER rows in
    * the category (plain category-mean leaks the row's own label
    * into its feature; LOO is the standard de-leak). Exact integer
    * milli: (Σ_cat − v_i)·1000 div (n_cat − 1); singleton categories
    * yield null (no other rows to learn from — the caller decides
    * the fallback prior). One category-partitioned window over the
    * fact grain; the label column must be integral (trunc/scale
    * upstream).
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, valCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(catCol))
    df.select(col(idCol), col(catCol), col(valCol))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col(valCol)).over(w))
      .withColumn("loo_milli",
        when(col("__n") > 1,
          expr(s"(__s - $valCol) * 1000L div (__n - 1L)")))
      .drop("__s")
      .withColumnRenamed("__n", "n_cat")
  }
}
