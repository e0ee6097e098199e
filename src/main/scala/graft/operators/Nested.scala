package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nested-document operators (SURVEY §1.1, §2.3 P11, §2.4 J5, §2.5
  * A1/A2, §2.7 F11).
  *
  * The reference's core data is nested JSON — config stacks with
  * `modules[]` keyed by `name` (`powerbi_main_fun.py:495-508,
  * 1651-1665`), per-segment rule arrays (`1222-1307`), gateway
  * `connectedEdgeList` (`gateway_script.py:304-321`) — all traversed
  * with Python loops. Here each traversal is a Catalyst higher-order
  * function (codegen'd, no shuffle) or a generator (`explode`), so the
  * document never leaves the executor and the operators compose with
  * pushdown/pruning:
  *
  *  - lookups/filters/existence over an array: `filter`/`exists`
  *    higher-order fns — O(|array|) per row, zero shuffle;
  *  - flattening to relational form: `explode`/`posexplode` — the only
  *    shape that lets downstream joins/aggs shuffle on ELEMENT keys;
  *  - cross-row elementwise vector math: `posexplode` + groupBy(pos) —
  *    the 100 TB-safe restatement of the reference's in-memory
  *    elementwise list addition (`powerbi_main_fun.py:1962-1968`).
  */
object Nested {

  /** P11: first array element whose `nameField` equals `name` — the
    * module-by-name lookup (`powerbi_main_fun.py:1141-1144,1651-1665`:
    * `[m for m in modules if m['name'] == 'deviceSettings'][0]`).
    * Returns a struct column (null when no element matches, the typed
    * form of the reference's IndexError-means-absent).
    */
  def moduleByName(arr: Column, nameField: String, name: String): Column =
    // get() is 0-based and null-on-out-of-bounds (element_at throws on
    // empty arrays under ANSI mode — absent module must mean null).
    get(filter(arr, m => m.getField(nameField) === lit(name)), lit(0))

  /** J5: explode an id array into bridge-table rows
    * (`gateway_script.py:304-321`: one (edge, gateway, date) row per
    * element of `connectedEdgeList`). Keeps `keyCols`, emits one row
    * per element with its 0-based `pos` — the unique key the sink
    * needs for idempotent upserts.
    */
  def explodeBridge(df: DataFrame, keyCols: Seq[String], arr: Column,
      elemName: String): DataFrame =
    df.select(keyCols.map(col) :+ posexplode_outer(arr).as(Seq("pos", elemName)): _*)

  /** A1: total element count across a nested (2-level) array — the
    * static-route count summed over segments
    * (`powerbi_main_fun.py:1294-1302`: `sum(len(seg['routes']) for seg
    * in segments)`).
    */
  def nestedCount(arrOfArr: Column): Column =
    coalesce(size(flatten(arrOfArr)), lit(0))

  /** A2: any-element existence over an array (`powerbi_main_fun.py:
    * 1230-1307`: bgp/ospf/netflow enabled at ANY interface/segment).
    */
  def existsAny(arr: Column, pred: Column => Column): Column =
    coalesce(exists(arr, pred), lit(false))

  /** F11: None→0 element fill (`powerbi_main_fun.py:1959-1961`) —
    * the reference patches missing samples before elementwise math.
    */
  def fillNullZero(arr: Column): Column =
    transform(arr, x => coalesce(x, lit(0)))

  /** A11 (vector half): elementwise sum of per-row arrays, grouped by
    * `key` — the reference sums link byte-series elementwise across
    * links of an edge (`powerbi_main_fun.py:1962-1968`). Emits
    * (key, pos, elem_sum) rows: posexplode + partial aggregation means
    * only per-(key,pos) partials shuffle, never whole vectors — the
    * layout that survives 100 TB and arbitrary vector width.
    *
    * `cast` controls the element sum type (pass a DECIMAL cast for
    * exact, order-independent totals under a hash-compare gate).
    */
  def elementwiseSum(df: DataFrame, key: String, arr: Column,
      cast: Column => Column): DataFrame =
    df.select(col(key), posexplode(arr).as(Seq("pos", "elem")))
      .groupBy(col(key), col("pos"))
      .agg(sum(cast(col("elem"))).as("elem_sum"))

  /** The reference's EXACT elementwise addition truncates to the
    * SHORTEST series in the group (Python `zip`,
    * `powerbi_main_fun.py:1962-1968`) — ragged tails are dropped, not
    * summed alone. [[elementwiseSum]] keeps every position (the
    * usually-wanted semantics); this variant filters positions beyond
    * the group minimum length for reference parity.
    */
  def elementwiseSumZip(df: DataFrame, key: String, arr: Column,
      cast: Column => Column): DataFrame = {
    val minLen = df.groupBy(col(key))
      .agg(min(size(arr)).as("__minlen"))
    elementwiseSum(df, key, arr, cast)
      .join(minLen, Seq(key))
      .filter(col("pos") < col("__minlen"))
      .drop("__minlen")
  }

  /** Sum a numeric array within one row (A11's per-series total,
    * `powerbi_main_fun.py:1954-1962`): higher-order `aggregate`, no
    * explode, stays inside whole-stage codegen.
    */
  def arraySum(arr: Column, zero: Column): Column =
    aggregate(arr, zero, (acc, x) => acc + coalesce(x, lit(0)))
}
