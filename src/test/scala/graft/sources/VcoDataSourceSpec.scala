package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Records every (vco, params) request so the spec can assert the
  * partition fan-out and the pruned with-list.
  */
object RecordedCalls {
  val calls = new ConcurrentLinkedQueue[String]()
}

class FakeFleetTransportFactory extends TransportFactory {
  def create(): VcoSource.Transport = new VcoSource.Transport {
    def call(method: String, params: String): Either[String, Seq[String]] = {
      RecordedCalls.calls.add(params)
      val vco = "\"vco\":\"([^\"]+)\"".r.findFirstMatchIn(params)
        .map(_.group(1)).getOrElse("?")
      Right(Seq(
        s"""{"id":1,"logicalId":"$vco-e1","name":"edge of $vco","edgeState":"CONNECTED","modelNumber":"edge540"}""",
        s"""{"id":2,"logicalId":"$vco-e2","name":"second","edgeState":"OFFLINE"}"""))
    }
  }
}

class VcoDataSourceSpec extends SparkSpec {

  private def read = spark.read.format("graft-vco")
    .option("vcos", "vco-a,vco-b,vco-c")
    .option("transport", classOf[FakeFleetTransportFactory].getName)
    .load()

  test("one partition per VCO, rows from every fleet member") {
    RecordedCalls.calls.clear()
    val df = read.select("logicalId", "edgeState")
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 6)
    val ids = df.collect().map(_.getString(0)).sorted
    assert(ids.head === "vco-a-e1" && ids.last === "vco-c-e2")
  }

  test("column pruning reaches the API with-list") {
    RecordedCalls.calls.clear()
    // narrow projection: no expansions referenced
    read.select("logicalId").collect()
    val narrow = RecordedCalls.calls.poll()
    assert(narrow.contains("\"with\":[]"), narrow)

    RecordedCalls.calls.clear()
    // selecting site+recentLinks must request exactly those expansions
    read.select(col("logicalId"), col("site.city"),
      explode_outer(col("recentLinks")).as("l")).collect()
    val wide = RecordedCalls.calls.poll()
    assert(wide.contains("\"site\"") && wide.contains("\"recentLinks\""), wide)
    assert(!wide.contains("\"licenses\""), wide)
  }

  test("filters still apply on top of the scan") {
    val connected = read.filter(col("edgeState") === "CONNECTED").count()
    assert(connected === 3)
  }

  test("enterpriseId/interval predicates push down into call params") {
    RecordedCalls.calls.clear()
    read.select("logicalId")
      .filter(col("enterpriseId") === "ent-1" &&
        col("lastContact") > "2024-01-01T00:00:00.000Z" &&
        col("lastContact") < "2024-02-01T00:00:00.000Z")
      .collect()
    val params = RecordedCalls.calls.poll()
    assert(params.contains("\"enterpriseId\":\"ent-1\""), params)
    assert(params.contains(
      "\"interval\":{\"start\":\"2024-01-01T00:00:00.000Z\"," +
        "\"end\":\"2024-02-01T00:00:00.000Z\"}"), params)
    // non-strict bounds must NOT push (an exclusive-bound server would
    // drop the boundary row and the residual can't resurrect it)
    RecordedCalls.calls.clear()
    read.select("logicalId")
      .filter(col("lastContact") >= "2024-01-01T00:00:00.000Z").collect()
    assert(!RecordedCalls.calls.poll().contains("interval"))
    // pushdown is best-effort: the predicate ALSO applies Spark-side,
    // so rows the fake server returns anyway are still filtered out
    // (fixture rows have null enterpriseId → none survive)
    RecordedCalls.calls.clear()
    val n = read.filter(col("enterpriseId") === "ent-1").count()
    assert(n === 0)
    assert(RecordedCalls.calls.poll().contains("\"enterpriseId\":\"ent-1\""))
  }

  test("COUNT(*) pushes down to the count scan; filtered counts do not") {
    RecordedCalls.calls.clear()
    val agg = read.agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("graft_vco_agg_pushdown"),
      s"count must plan the pushed scan:\n${plan.take(1200)}")
    assert(agg.collect()(0).getLong(0) === 6L) // 3 VCOs × 2 edges
    // the count request carries an EMPTY with-list — no payload shipped
    val calls = Iterator.continually(RecordedCalls.calls.poll())
      .takeWhile(_ != null).toSeq
    assert(calls.nonEmpty && calls.forall(_.contains("\"with\":[]")), calls)
    // a residual-filtered count must stay on the ROW scan (Catalyst
    // only pushes aggregates when no post-scan filter remains)
    val filtered = read.filter(col("edgeState") === "CONNECTED")
      .agg(count(lit(1)).as("n"))
    val fPlan = filtered.queryExecution.executedPlan.toString
    assert(!fPlan.contains("graft_vco_agg_pushdown"))
    assert(filtered.collect()(0).getLong(0) === 3L)
  }

  test("empty-fleet count stays on the row scan and returns 0") {
    // zero count-partitions would make the final Sum-of-partials NULL
    // where COUNT(*) over zero rows must be 0 — the builder refuses
    // the pushdown instead
    val df = spark.read.format("graft-vco").option("vcos", "")
      .option("transport", classOf[FakeFleetTransportFactory].getName)
      .load().agg(count(lit(1)).as("n"))
    assert(!df.queryExecution.executedPlan.toString
      .contains("graft_vco_agg_pushdown"))
    assert(df.collect()(0).getLong(0) === 0L)
  }

  test("MIN/MAX(id) push with COUNT in one agg scan; other columns do not") {
    RecordedCalls.calls.clear()
    val agg = read.agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
      max(col("id")).as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("graft_vco_agg_pushdown"),
      s"min/max must plan the pushed scan:\n${plan.take(1200)}")
    val row = agg.collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
      ((6L, 1L, 2L)))
    // partial rows came from no-expansion requests
    val calls = Iterator.continually(RecordedCalls.calls.poll())
      .takeWhile(_ != null).toSeq
    assert(calls.nonEmpty && calls.forall(_.contains("\"with\":[]")), calls)
    // a non-id min is not a shape the source answers → row scan
    val other = read.agg(min(col("logicalId")).as("mn"))
    assert(!other.queryExecution.executedPlan.toString
      .contains("graft_vco_agg_pushdown"))
    assert(other.collect()(0).getString(0) === "vco-a-e1")
  }
}
