package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / filter / join operators (SURVEY §2.3, §2.4).
  *
  * The reference implements every join as a Python nested loop over
  * in-memory lists (e.g. link-metrics × WAN links,
  * `powerbi_main_fun.py:1651-1665`) and every filter as an `if` inside a
  * row loop. Here each is a declarative Catalyst plan: filters push into
  * the parquet scan, small dimensions broadcast, and existence checks are
  * semi/anti joins (no row-at-a-time probes like `fun_mysql_query.py`).
  */
object Relational {

  /** Null-key filter + defaulted scalar projection (P2 + P12,
    * `powerbi_main_fun.py:447-449,1088-1129`): drop rows with a null
    * primary key, substitute "Not set" for missing descriptive fields.
    */
  def projectWithDefaults(df: DataFrame, keyCol: String,
      defaulted: Seq[(String, String)]): DataFrame = {
    val cols = col(keyCol) +: defaulted.map { case (c, dflt) =>
      coalesce(col(c), lit(dflt)).as(c)
    }
    df.filter(col(keyCol).isNotNull).select(cols: _*)
  }

  /** Membership anti-filter (P4, `powerbi_main_fun.py:845-851`): keep rows
    * whose `col` is NOT in a small skip-list. The list is inlined as a
    * literal so Catalyst folds it into the scan predicate.
    */
  def antiFilter(df: DataFrame, c: String, skip: Seq[String]): DataFrame =
    df.filter(!col(c).isin(skip: _*))

  /** Broadcast dimension enrichment (J1/J4,
    * `powerbi_main_fun.py:1651-1665,688-690`): left-join a fact frame to a
    * small dimension. The dim is explicitly broadcast — at 100 TB the fact
    * side never shuffles for this join.
    */
  def enrich(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left")

  /** Existence semi-join (J2/J3, `powerbi_main_fun.py:1421-1426,859-879`):
    * rows of `left` having at least one match in `right`. Replaces the
    * reference's per-entity SQL existence probes
    * (`fun_mysql_query.py:129-161`) with one distributed join.
    */
  def existsIn(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Absence anti-join (J6, `fun_mysql_query.py:17-112`): the incremental
    * "new entities" predicate — rows of `left` with no match in `right`
    * (the gold snapshot). This is the batch form of the reference's
    * freshness probes (P9).
    */
  def notIn(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Freshness anti-join (P9/J6, `fun_mysql_query.py:17-60`): candidates
    * whose key is absent from the snapshot OR whose snapshot row is stale
    * (`lastUpdated` older than the cutoff). Returns candidate rows that
    * need recompute.
    */
  def staleOrMissing(candidates: DataFrame, snapshot: DataFrame,
      keys: Seq[String], snapshotTs: String, cutoff: Column): DataFrame = {
    val fresh = snapshot.filter(col(snapshotTs) >= cutoff).select(keys.map(col): _*)
    candidates.join(fresh, keys, "left_anti")
  }

  /** Deterministic sampling throttle (P10, `powerbi_main_fun.py:271,629`):
    * the reference uses `random.random()`; for reproducible pipelines we
    * sample on a stable key hash (`pmod(key, denom) == 0`) so the same
    * entities are picked every run — testable, and at scale it avoids a
    * nondeterministic recompute set between retried tasks.
    */
  def sampleByKey(df: DataFrame, key: String, denom: Int): DataFrame =
    df.filter(pmod(col(key), lit(denom)) === 0)

  /** P1 `clean_customers` (`Functions/data_sanitization.py:31-62`),
    * reproduced exactly: optionally keep only `argCustomer` (numeric
    * id equality), then drop customers whose logicalId appears in the
    * moved list WITH this VCO named among their old VCOs. The moved
    * list is a tiny map ⇒ broadcast anti-join on (logicalId, vco).
    */
  def cleanCustomers(customers: DataFrame, vcoName: String,
      moved: Map[String, Seq[String]] = Map.empty,
      argCustomer: Option[Long] = None): DataFrame = {
    val spark = customers.sparkSession
    import spark.implicits._
    val afterArg = argCustomer match {
      case Some(id) => customers.filter(col("id") === id)
      case None => customers
    }
    val movedHere = moved.toSeq
      .filter { case (_, vcos) => vcos.contains(vcoName) }
      .map(_._1)
    if (movedHere.isEmpty) afterArg
    else afterArg.join(broadcast(movedHere.toDF("logicalId")),
      Seq("logicalId"), "left_anti")
  }

  /** Large-set membership via broadcast semi-join (P5: the reference's
    * 46-version `outdatedversion` / ~150-version `eoslversion` lists,
    * `powerbi_main_fun.py:944-1014`). For a handful of values
    * [[antiFilter]]'s inlined `isin` folds into the scan predicate;
    * past a few hundred the literal chain bloats codegen — a
    * broadcast dim + semi-join keeps the scan clean and the probe
    * O(1) per row, at any list size.
    */
  def broadcastSetFilter(df: DataFrame, c: String, values: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = values.toDF(c)
    df.join(broadcast(dim), Seq(c), "left_semi")
  }

  /** CDC-style snapshot diff: classify every key as `added` /
    * `removed` / `changed` / `unchanged` between two snapshots of the
    * same table — the incremental-refresh primitive behind
    * [[staleOrMissing]] generalized to a full change feed (what a
    * MERGE sink or downstream-invalidation step consumes).
    *
    * One full-outer sort-merge join on the key columns; comparisons
    * are null-safe (`<=>`), so a null→value flip is `changed`, not a
    * spurious match. 100 TB shape: both sides shuffle once on the
    * key — bucketed/pre-partitioned snapshots join co-located.
    *
    * Output: (keys…, change) with change ∈
    * {added, removed, changed, unchanged}.
    */
  /** ANALYZE-style column profile in ONE corpus pass: per column,
    * null count and exact distinct count, in long format. The
    * multi-distinct agg plans through Catalyst's Expand (one
    * duplicated stream per distinct column) — the standard exact
    * shape; at 100 TB swap `countDistinct` for `approx_count_distinct`
    * (HLL partials, no Expand) without changing this operator's
    * surface.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__dist_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
        s"'$c', __nulls_$c, __dist_$c").mkString(", ")
    wide.select(col("__n").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nulls, n_distinct)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
  }

  /** Referential-integrity audit of one FK edge: row/null/orphan/match
    * counts. The orphan probe is a broadcast LEFT join against the
    * DISTINCT key set of the dimension (never the fact side), so the
    * audit costs one fact scan + one dim-key aggregate — the shape
    * that holds when the fact table is the 100 TB side.
    */
  def fkAudit(fact: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String): DataFrame = {
    val keys = dim.select(col(pkCol).as("__pk")).distinct()
      .withColumn("__hit", lit(1L))
    fact.select(col(fkCol).as("__fk"))
      .join(broadcast(keys), col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("n_null_fk"),
        sum(when(col("__fk").isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)).as("n_orphans"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
  }

  /** Apply a CDC changeset to a snapshot: rows keyed in `changes`
    * replace (op 'U'/'I') or remove (op 'D') their snapshot rows;
    * unkeyed snapshot rows carry over — the MERGE INTO shape (Delta/
    * Iceberg upsert semantics) as one full-outer key join. Exactly
    * the inverse of [[snapshotDiff]]: applying a diff'd changeset to
    * the old snapshot reproduces the new one.
    *
    * Both inputs must share the key columns; `changes` carries the
    * payload columns of the snapshot plus `opCol`. One shuffle join
    * keyed by the snapshot key — at 100 TB the changeset side is
    * typically small enough to broadcast, which Catalyst/AQE decides
    * from stats.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String], payload: Seq[String], opCol: String): DataFrame = {
    val snap = snapshot.select(
      (keys.map(col) ++ payload.map(c => col(c).as(s"__s_$c"))): _*)
    val chg = changes.select(
      (keys.map(col) ++ payload.map(c => col(c).as(s"__c_$c")) :+
        col(opCol).as("__op")): _*)
    snap.join(chg, keys, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select((keys.map(col) ++ payload.map(c =>
        when(col("__op").isNotNull, col(s"__c_$c"))
          .otherwise(col(s"__s_$c")).as(c))): _*)
  }

  /** Right-to-erasure cascade audit (GDPR Art. 17 shape): given a
    * subject-key deletion set, follow the foreign-key chain
    * root → child → grandchild and report, per table, how many rows
    * the erasure touches and how many survive — the reviewable
    * manifest a deletion job emits BEFORE any destructive write.
    *
    * `tables` is ordered: each entry is (name, df, keyCol, parentRef)
    * where parentRef names the column that joins this table to the
    * PREVIOUS entry's key (None for the root, which joins the subject
    * set directly). Affected keys propagate level by level as
    * semi-joins on the key columns: each level's affected-key frame
    * is key-grain (small side — AQE broadcasts it), so the cascade
    * never rescans upstream tables and each fact table is read once.
    *
    * Returns one row per table: (tbl, n_rows, n_affected,
    * n_surviving), n_affected + n_surviving = n_rows.
    */
  def erasureCascade(subjects: DataFrame, subjectKey: String,
      tables: Seq[(String, DataFrame, String, Option[String])]): DataFrame = {
    require(tables.nonEmpty && tables.head._4.isEmpty,
      "first table is the root and joins the subject set directly")
    val subjectKeys = subjects.select(col(subjectKey)).distinct()
    val (rows, _) = tables.foldLeft(
        (Seq.empty[DataFrame], subjectKeys)) {
      case ((acc, parentKeys), (name, df, keyCol, parentRef)) =>
        val joinCol = parentRef.getOrElse(subjectKey)
        val affected = df.join(
          parentKeys.withColumnRenamed(parentKeys.columns.head, joinCol),
          Seq(joinCol), "left_semi")
        val affectedKeys = affected.select(col(keyCol)).distinct()
        val stats = df.agg(count(lit(1)).as("n_rows"))
          .crossJoin(affected.agg(count(lit(1)).as("n_affected")))
          .select(lit(name).as("tbl"), col("n_rows"), col("n_affected"),
            (col("n_rows") - col("n_affected")).as("n_surviving"))
        (acc :+ stats, affectedKeys)
    }
    rows.reduce(_.unionByName(_))
  }

  /** Rendezvous (highest-random-weight) shard assignment: a key
    * routes to the shard maximizing md5(key # shard) — the
    * consistent-hashing scheme with the MINIMAL-MOVEMENT property:
    * growing n → n+1 shards moves only keys whose new shard WINS
    * their rendezvous (≈ 1/(n+1) of them), where mod-n hashing
    * reshuffles ≈ n/(n+1). Pure projection (the argmax is a
    * plan-time-unrolled greatest-struct over n candidates — no
    * shuffle, no dim table), deterministic, so assignment tables
    * hash-gate and routing is reproducible across jobs — the shard
    * router for stateful services, cache tiers, and sticky
    * partitioned sinks.
    */
  def rendezvousShard(keyCol: Column, nShards: Int): Column = {
    require(nShards >= 1)
    val scored = (0 until nShards).map { sh =>
      struct(
        graft.operators.TextAnalysis.hash60(
          concat_ws("#", keyCol, lit(sh))).as("w"),
        lit(sh).as("sh"))
    }
    greatest(scored: _*).getField("sh")
  }

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty)
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__new_$c")): _*)
      .withColumn("__in_new", lit(true))
    val someChanged = compareCols
      .map(c => !(col(c) <=> col(s"__new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(someChanged, lit("changed"))
          .otherwise(lit("unchanged")).as("change"): _*)
  }

  /** Incremental maintenance of an INNER equi-join view under
    * appends: the rows to ADD to the materialized view when `deltaLeft`
    * and `deltaRight` arrive is
    * ΔM = ΔL ⋈ (R ∪ ΔR)  ∪  L ⋈ ΔR
    * — the classic delta-join identity with the ΔL ⋈ ΔR term folded
    * into the first join so no pair is produced twice. Each term
    * joins a DELTA against a base: at 100 TB the base side streams
    * once and the delta (a micro-batch) broadcasts, so view refresh
    * cost scales with the CHANGE, not the view — the base ⋈ base
    * join that makes full refresh quadratic in practice is never
    * re-executed. Append-only (no retractions); updates/deletes
    * compose with [[applyChanges]] upstream.
    */
  def deltaJoinUpdates(left: DataFrame, deltaLeft: DataFrame,
      right: DataFrame, deltaRight: DataFrame,
      keys: Seq[String]): DataFrame =
    deltaLeft.join(right.unionByName(deltaRight), keys, "inner")
      .unionByName(left.join(deltaRight, keys, "inner"))

  /** 2-D Pareto front (skyline) per group, both criteria MAXIMIZED:
    * keep a row iff no same-group row is ≥ on both criteria and
    * strictly greater on one — multi-criteria selection (e.g. the
    * longest-AND-richest documents per source) without scoring the
    * criteria into one number.
    *
    * Not the O(n²) NOT EXISTS: one partial agg collapses rows to
    * per-(group, x) maxima (bounded by distinct x values, not rows),
    * one per-group window over that frame takes the running max of y
    * over strictly-greater x, and survivors semi-join back — row r
    * lives iff its y equals its x-level max AND beats every y at
    * higher x. The window runs on the collapsed frame, so the sort
    * is over distinct (group, x), and the join back is
    * broadcast-scale (fronts are small by nature).
    */
  def skyline2d(df: DataFrame, grpCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val xLevel = df.groupBy(col(grpCol), col(xCol))
      .agg(max(col(yCol)).as("__ymax"))
    val w = Window.partitionBy(col(grpCol)).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = xLevel
      .withColumn("__prev", max(col("__ymax")).over(w))
      .filter(col("__prev").isNull || col("__prev") < col("__ymax"))
      .select(col(grpCol), col(xCol), col("__ymax"))
    df.join(front, Seq(grpCol, xCol))
      .filter(col(yCol) === col("__ymax"))
      .drop("__ymax")
  }

  /** Replica divergence detection, rsync-style: row-by-row comparison
    * of two copies of a 100 TB table is a full shuffle of BOTH; this
    * protocol first exchanges per-bucket CHECKSUMS (row count + XOR
    * of a 60-bit row signature — one partial agg per replica, bytes
    * per bucket on the wire) and then runs the exact keyed diff ONLY
    * inside buckets whose checksums disagree. Identical replicas
    * cost two scans and a bucket-grain join; localized divergence
    * narrows the expensive full-outer diff to the touched buckets.
    *
    * The checksum screen is probabilistically complete: missing a
    * diverged bucket needs coordinated changes whose signatures
    * XOR-cancel at equal row count (~2^-60 — the standard checksum-
    * protocol caveat; [[snapshotDiff]] is the exact-but-full-shuffle
    * alternative). Signature nulls: concat_ws skips null payload
    * columns, so null→empty-string edits are invisible to the SCREEN;
    * the in-bucket diff still catches them when any co-bucketed row
    * diverged. Returns the [[snapshotDiff]] frame (key + change)
    * restricted to diverged buckets, plus the bucket id.
    */
  def replicaDiff(a: DataFrame, b: DataFrame, keyCol: String,
      payload: Seq[String], nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && payload.nonEmpty)
    def sigs(df: DataFrame): DataFrame = df.select(col(keyCol),
      pmod(col(keyCol), lit(nBuckets.toLong)).as("__bucket"),
      TextAnalysis.hash60(concat_ws("\u0001",
        (keyCol +: payload).map(col): _*)).as("__sig"))
    def sums(df: DataFrame): DataFrame = sigs(df)
      .groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"), expr("bit_xor(__sig)").as("__x"))
    val diverged = sums(a)
      .select(col("__bucket"), col("__n").as("__na"), col("__x").as("__xa"))
      .join(sums(b).select(col("__bucket"), col("__n").as("__nb"),
        col("__x").as("__xb")), Seq("__bucket"), "full_outer")
      .filter(!(col("__na") <=> col("__nb")) || !(col("__xa") <=> col("__xb")))
      .select(col("__bucket"))
    def slice(df: DataFrame): DataFrame = df
      .withColumn("__bucket", pmod(col(keyCol), lit(nBuckets.toLong)))
      .join(broadcast(diverged), Seq("__bucket"), "left_semi")
    snapshotDiff(slice(a), slice(b), Seq(keyCol), payload)
      .withColumn("bucket", pmod(col(keyCol), lit(nBuckets.toLong)))
  }

  /** Hot-key diagnostic — the skew report that decides whether a join
    * or aggregation on `keyCol` needs salting ([[graft.operators.Skew]])
    * before it ships: top-N keys by frequency with their exact ppm
    * share and cumulative share of ALL rows. One key-grouped partial
    * agg (the same shuffle the skewed operation itself would pay)
    * then a window over the N-row head; share denominators come from
    * a 1-row total attach, integral ppm throughout.
    */
  def hotKeys(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1)
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("__n"))
    // orderBy+limit plans as TakeOrderedAndProject (per-partition
    // top-N, merged on the driver) — a rank window here would drag
    // the WHOLE key frame through one partition; the window below
    // only ever sees the N-row head
    val head = counts.orderBy(col("cnt").desc, col(keyCol)).limit(topN)
    val wRank = Window.orderBy(col("cnt").desc, col(keyCol))
    val top = head.withColumn("rank", row_number().over(wRank).cast("long"))
    top.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("cnt * 1000000L div __n"))
      .withColumn("cum_ppm",
        expr("sum(cnt) OVER (ORDER BY rank) * 1000000L div __n"))
      .select(col("rank"), col(keyCol), col("cnt"), col("share_ppm"),
        col("cum_ppm"))
  }
}
