package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("cleanCustomers: arg-customer narrowing and moved-list exclusion") {
    import spark.implicits._
    val customers = Seq(
      (1L, "c-1", "Acme"), (2L, "c-2", "Globex"), (3L, "c-3", "Initech")
    ).toDF("id", "logicalId", "name")
    val moved = Map("c-2" -> Seq("vco-east", "vco-west"), "c-3" -> Seq("vco-north"))

    // c-2 was moved FROM vco-east: excluded there, kept elsewhere.
    val east = Relational.cleanCustomers(customers, "vco-east", moved)
      .select("logicalId").collect().map(_.getString(0)).sorted
    assert(east.toSeq === Seq("c-1", "c-3"))
    val south = Relational.cleanCustomers(customers, "vco-south", moved)
    assert(south.count() === 3)
    // arg customer narrows to one row by numeric id (moved list not
    // involved on this VCO)
    val only = Relational.cleanCustomers(customers, "vco-south", moved, Some(2L))
      .select("logicalId").collect().map(_.getString(0))
    assert(only.toSeq === Seq("c-2"))
  }

  test("cleanCustomers: moved exclusion applies after arg narrowing (reference order)") {
    import spark.implicits._
    val customers = Seq((2L, "c-2", "Globex")).toDF("id", "logicalId", "name")
    val moved = Map("c-2" -> Seq("vco-east"))
    val got = Relational.cleanCustomers(customers, "vco-east", moved, Some(2L))
    assert(got.count() === 0)
  }

  test("staleOrMissing returns absent and stale candidates") {
    import spark.implicits._
    val candidates = Seq(("e-1", 1), ("e-2", 2), ("e-3", 3)).toDF("id", "payload")
    val snapshot = Seq(
      ("e-1", "2024-01-10 00:00:00"), // fresh
      ("e-2", "2023-12-01 00:00:00")  // stale
    ).toDF("id", "lastUpdated")
      .withColumn("lastUpdated", col("lastUpdated").cast("timestamp"))
    val got = Relational.staleOrMissing(candidates, snapshot, Seq("id"),
        "lastUpdated", lit("2024-01-01 00:00:00").cast("timestamp"))
      .select("id").collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("e-2", "e-3"))
  }

  test("projectWithDefaults drops null keys and fills Not set") {
    import spark.implicits._
    val df = Seq(
      (Some("e-1"), Some("Palo Alto"), None: Option[String]),
      (None, Some("x"), Some("y"))
    ).toDF("id", "city", "country")
    val got = Relational.projectWithDefaults(df, "id",
        Seq("city" -> "Not set", "country" -> "Not set"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(("e-1", "Palo Alto", "Not set")))
  }

  test("broadcastSetFilter keeps only members") {
    import spark.implicits._
    val df = Seq("v1", "v99", "v45").toDF("version")
    val got = Relational.broadcastSetFilter(df, "version",
        (0 until 46).map(i => s"v$i"))
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("v1", "v45"))
  }

  test("snapshotDiff classifies changes null-safely") {
    import spark.implicits._
    val oldS = Seq(
      (1L, "a", Some(10.0)), (2L, "b", None),
      (3L, "c", Some(3.0)), (4L, "d", Some(4.0)))
      .toDF("k", "name", "bal")
    val newS = Seq(
      (2L, "b", Some(5.0)), (3L, "c", Some(3.0)),
      (4L, "D", Some(4.0)), (5L, "e", Some(1.0)))
      .toDF("k", "name", "bal")
    val got = Relational.snapshotDiff(oldS, newS, Seq("k"),
        Seq("name", "bal"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "removed",   // key gone
      2L -> "changed",   // null → 5.0 must NOT read as equal
      3L -> "unchanged",
      4L -> "changed",   // name case flip
      5L -> "added"))
  }

  test("profileColumns: null and exact distinct counts per column") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(2L)),
      (Some("b"), None), (None, Some(2L))
    ).toDF("s", "v")
    val got = Relational.profileColumns(df, Seq("s", "v"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("s") === ((4L, 1L, 2L))) // distinct excludes null
    assert(got("v") === ((4L, 1L, 2L)))
  }

  test("applyChanges: insert, update, delete, carry-over; diff∘apply round-trips") {
    import spark.implicits._
    val snap = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "b2", 20.0, "U"),  // update
      (3L, "c", 3.0, "D"),    // delete (payload ignored)
      (4L, "d", 4.0, "I"))    // insert
      .toDF("k", "name", "bal", "op")
    val got = Relational.applyChanges(snap, changes, Seq("k"),
        Seq("name", "bal"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 1.0),    // untouched carries over
      (2L, "b2", 20.0),  // updated payload wins
      (4L, "d", 4.0)))   // inserted; 3 deleted

    // the algebraic property: apply(old, diff(old → new)-as-changes) = new
    val newSnap = Seq((1L, "a", 1.0), (2L, "b2", 20.0), (4L, "d", 4.0))
      .toDF("k", "name", "bal")
    val ops = Relational.snapshotDiff(snap, newSnap, Seq("k"),
        Seq("name", "bal"))
      .filter(col("change") =!= "unchanged")
    val asChanges = ops.join(newSnap, Seq("k"), "left")
      .select(col("k"), col("name"), col("bal"),
        when(col("change") === "removed", "D")
          .when(col("change") === "added", "I").otherwise("U").as("op"))
    val round = Relational.applyChanges(snap, asChanges, Seq("k"),
        Seq("name", "bal"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(round.toSeq === got.toSeq)
  }

  test("fkAudit counts rows, null FKs, orphans, and matches") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 2L, 3L).toDF("pk") // dup pk must not multiply
    val r = Relational.fkAudit(fact, "fk", dim, "pk").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((5L, 1L, 1L, 3L)))
  }

  test("erasureCascade follows the FK chain and reconciles per level") {
    import spark.implicits._
    val customers = Seq(1L, 2L, 3L).toDF("cust")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("ord", "o_cust")
    val lines = Seq((10L, 1), (10L, 2), (12L, 1), (13L, 1), (99L, 1))
      .toDF("l_ord", "ln") // 99 orphan line: untouched by the cascade
    val subjects = Seq(1L, 2L).toDF("cust")
    val got = Relational.erasureCascade(subjects, "cust", Seq(
        ("customer", customers, "cust", None),
        ("orders", orders, "ord", Some("o_cust")),
        ("lineitem", lines, "l_ord", Some("l_ord"))))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // subjects {1,2} → orders {10,11,12} → lines of those orders (3)
    assert(got === Map(
      "customer" -> (3L, 2L, 1L),
      "orders" -> (4L, 3L, 1L),
      "lineitem" -> (5L, 3L, 2L)))
    got.values.foreach { case (n, a, s) => assert(a + s === n) }
    // root entry must be first
    intercept[IllegalArgumentException] {
      Relational.erasureCascade(subjects, "cust",
        Seq(("orders", orders, "ord", Some("o_cust"))))
    }
  }

  test("rendezvousShard: minimal movement 4 → 5 shards, mod-hash doesn't") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("k")
    val assigned = keys.select(col("k"),
        Relational.rendezvousShard(col("k"), 4).as("s4"),
        Relational.rendezvousShard(col("k"), 5).as("s5"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every shard in range; shards reasonably balanced
    assert(assigned.forall { case (_, a, b) => a >= 0 && a < 4 && b >= 0 && b < 5 })
    val sizes4 = assigned.groupBy(_._2).view.mapValues(_.size)
    assert(sizes4.values.forall(n => n > 350 && n < 650), sizes4.toMap)
    // minimal movement: moved keys all moved TO the new shard 4, and
    // the moved fraction is ≈ 1/5 (binomial tolerance)
    val moved = assigned.filter { case (_, a, b) => a != b }
    assert(moved.forall(_._3 == 4))
    assert(moved.size > 300 && moved.size < 500, moved.size)
  }

  test("deltaJoinUpdates: view0 ∪ Δ ≡ full recompute, no pair twice") {
    import spark.implicits._
    val oldL = Seq((1L, "l1"), (2L, "l2")).toDF("k", "lv")
    val newL = Seq((2L, "l2b"), (3L, "l3")).toDF("k", "lv")
    val oldR = Seq((1L, "r1"), (3L, "r3")).toDF("k", "rv")
    val newR = Seq((2L, "r2"), (3L, "r3b")).toDF("k", "rv")
    val view0 = oldL.join(oldR, Seq("k"))
    val delta = Relational.deltaJoinUpdates(oldL, newL, oldR, newR, Seq("k"))
    val maintained = view0.unionByName(delta)
      .as[(Long, String, String)].collect().sorted.toSeq
    val full = oldL.unionByName(newL)
      .join(oldR.unionByName(newR), Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq
    // multiset equality: duplicates from double-counting ΔL⋈ΔR or
    // missing cross terms would both show here
    assert(maintained === full)
    // empty deltas → empty view delta
    val none = Relational.deltaJoinUpdates(
      oldL, newL.limit(0), oldR, newR.limit(0), Seq("k"))
    assert(none.count() === 0L)
  }

  test("skyline2d: dominance, x-ties, exact-duplicate survivors") {
    import spark.implicits._
    val rows = Seq(
      // group a: (5,1) and (3,4) are the front; (3,2) dominated by
      // (3,4) via same-x higher-y; (2,4) dominated by (3,4) via
      // higher-x equal-y; (1,1) dominated by everything
      ("a", 5L, 1L, "keep1"), ("a", 3L, 4L, "keep2"),
      ("a", 3L, 2L, "drop_samex"), ("a", 2L, 4L, "drop_eqy"),
      ("a", 1L, 1L, "drop_both"),
      // group b: exact duplicates on (x, y) neither dominates — both
      // survive; groups are independent
      ("b", 7L, 7L, "dup1"), ("b", 7L, 7L, "dup2"), ("b", 8L, 6L, "k3")
    ).toDF("g", "x", "y", "tag")
    val front = Relational.skyline2d(rows, "g", "x", "y")
      .select("tag").as[String].collect().sorted.toSeq
    assert(front === Seq("dup1", "dup2", "k3", "keep1", "keep2"))
  }

  test("replicaDiff: identical replicas silent; localized divergence found") {
    import spark.implicits._
    val a = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    // identical replicas → empty diff (and no bucket survives the
    // checksum screen, which is the cheap-path point)
    assert(Relational.replicaDiff(a, a, "k", Seq("v"), 16).count() === 0L)
    // one edit, one delete, one insert
    val b = a.filter($"k" =!= 50L)
      .withColumn("v", when($"k" === 7L, lit("edited")).otherwise($"v"))
      .unionByName(Seq((999L, "new")).toDF("k", "v"))
    val d = Relational.replicaDiff(a, b, "k", Seq("v"), 16)
      .filter($"change" =!= "unchanged")
      .select($"k", $"change").as[(Long, String)].collect().toSet
    assert(d === Set((7L, "changed"), (50L, "removed"), (999L, "added")))
    // null payload vs value counts as changed (null-safe compare)
    val withNull = a.withColumn("v", when($"k" === 3L, lit(null)).otherwise($"v"))
    val dn = Relational.replicaDiff(a, withNull, "k", Seq("v"), 16)
      .filter($"change" =!= "unchanged")
      .select($"k", $"change").as[(Long, String)].collect().toSet
    assert(dn === Set((3L, "changed")))
  }
}
