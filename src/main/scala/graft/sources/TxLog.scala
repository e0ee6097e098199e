package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal transaction-log table format — the lakehouse commit
  * protocol (Delta/Iceberg's core idea) reduced to its Spark-native
  * essentials: data lives in immutable parquet files, and a tiny
  * append-only JSON log under `_log/` is the single source of truth
  * for WHICH files constitute each table version. Readers never list
  * the data directory (object-store listing is both slow and
  * eventually consistent at 100 TB); they read the log, which also
  * carries per-file row counts and min/max stats of a designated
  * long column, so range reads can skip whole files BEFORE the scan
  * — log-level pruning on top of parquet's own row-group pruning.
  *
  * Commits are single-writer (the caller's scheduler serializes
  * them — the multi-writer optimistic-concurrency layer of a full
  * lakehouse format is out of scope and documented as such):
  * `commit` writes data under `data-v{N}/`, derives per-file stats
  * with one Spark job (groupBy input_file_name — the stats
  * computation is itself distributed), and finally renames the log
  * entry into place — the rename is the atomic commit point, so a
  * reader either sees version N entirely or not at all.
  *
  * Log schema (one JSON line per data file, flat on purpose so
  * `spark.read.json` consumes the whole `_log/` directory as one
  * DataFrame): {version, mode, path, rows, mn, mx}. An `overwrite`
  * commit resets the live set to its own files; `append` adds to it.
  * Time travel = filter `version <= asOf` before resolving the live
  * set.
  */
object TxLog {

  val logSchema: StructType = StructType(Seq(
    StructField("version", LongType),
    StructField("mode", StringType),
    StructField("path", StringType),
    StructField("rows", LongType),
    StructField("mn", LongType),
    StructField("mx", LongType)))

  private def logDir(dir: String) = new java.io.File(dir, "_log")

  /** Committed versions, ascending (driver-side: the log is metadata,
    * bounded by commit count, never by data volume).
    */
  def versions(dir: String): Seq[Long] = {
    val d = logDir(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.map(_.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted
  }

  /** Commit a DataFrame as the next table version. Returns the new
    * version number. `statCol` must be a long column; its per-file
    * min/max land in the log for [[prunedRead]].
    */
  def commit(df: DataFrame, dir: String, mode: String,
      statCol: String): Long = {
    require(mode == "append" || mode == "overwrite",
      s"mode must be append|overwrite, got $mode")
    val spark = df.sparkSession
    val v = versions(dir).lastOption.map(_ + 1).getOrElse(0L)
    val dataRel = s"data-v$v"
    val dataAbs = new java.io.File(dir, dataRel).toString
    df.write.parquet(dataAbs)
    // distributed per-file stats: one pass over what was just written
    val stats = spark.read.parquet(dataAbs)
      .groupBy(input_file_name().as("uri"))
      .agg(count(lit(1)).as("rows"),
        min(col(statCol)).as("mn"), max(col(statCol)).as("mx"))
      .collect()
      .map { r =>
        val name = r.getString(0).split('/').last
        (s"$dataRel/$name", r.getLong(1), r.getLong(2), r.getLong(3))
      }
      .sortBy(_._1)
    val lines = stats.map { case (p, n, mn, mx) =>
      s"""{"version":$v,"mode":"$mode","path":"$p","rows":$n,"mn":$mn,"mx":$mx}"""
    }
    val ld = logDir(dir)
    ld.mkdirs()
    val tmp = new java.io.File(ld, s".v$v.json.tmp")
    java.nio.file.Files.write(tmp.toPath,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    // atomic commit point: the entry appears whole or not at all
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(ld, s"v$v.json").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** The log as a DataFrame, optionally as of a version. */
  def log(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val all = spark.read.schema(logSchema).json(logDir(dir).toString)
    asOf.fold(all)(v => all.filter(col("version") <= v))
  }

  /** Log rows of the files LIVE at `asOf` (or latest): everything at
    * or after the last overwrite in range. The overwrite watermark is
    * a one-row driver readout over commit-count-bounded metadata.
    */
  def liveFiles(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val lg = log(spark, dir, asOf)
    val base = lg.filter(col("mode") === "overwrite")
      .agg(max(col("version"))).head().get(0) match {
      case null => 0L
      case v: Long => v
    }
    lg.filter(col("version") >= base)
  }

  /** Read the table (optionally time-traveled). The file list comes
    * from the LOG, never from directory listing.
    */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val paths = liveFiles(spark, dir, asOf)
      .select(col("path")).collect().map(r => s"$dir/${r.getString(0)}")
    require(paths.nonEmpty, s"no live files in tx table $dir at $asOf")
    spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** Compact the live file set into `targetFiles` range-sorted files
    * and commit the result as a new `overwrite` version — the
    * small-file maintenance every streaming-ingested table needs
    * (thousands of micro-batch files → scan-efficient large ones).
    * Content is byte-identical by construction (one read of the live
    * set, one range-repartitioned rewrite); history is untouched —
    * pre-compaction versions still time-travel, because old data
    * files are immutable and the log only ever appends. Returns the
    * new version.
    */
  def compact(spark: SparkSession, dir: String, statCol: String,
      targetFiles: Int): Long = {
    require(targetFiles > 0)
    commit(read(spark, dir).repartitionByRange(targetFiles, col(statCol)),
      dir, "overwrite", statCol)
  }

  /** Vacuum: delete data files not needed to reconstruct ANY version
    * ≥ `keepFrom` — the retention cleanup that bounds storage after
    * compactions and overwrites. The safe boundary is NOT `keepFrom`
    * itself: a file appended long before `keepFrom` is still live if
    * no overwrite superseded it, so the deletable set is everything
    * strictly below the last overwrite at-or-before `keepFrom`
    * (every retained version's live set starts at or after that
    * watermark). Time travel below the watermark stops working by
    * design; the log is never deleted, so version HISTORY stays
    * auditable. Returns the number of files removed. Driver-side
    * file ops over commit-count-bounded metadata — nothing scans
    * data.
    */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long): Long = {
    val lg = log(spark, dir).select(col("version"), col("mode"),
      col("path")).collect()
    val keepBase = lg.filter(r => r.getString(1) == "overwrite" &&
        r.getLong(0) <= keepFrom)
      .map(_.getLong(0)).sorted.lastOption.getOrElse(0L)
    val keep = lg.filter(_.getLong(0) >= keepBase)
      .map(_.getString(2)).toSet
    val candidates = lg.filter(_.getLong(0) < keepBase)
      .map(_.getString(2)).distinct
      .filterNot(keep.contains)
    var removed = 0L
    candidates.foreach { rel =>
      if (java.nio.file.Files.deleteIfExists(
          new java.io.File(dir, rel).toPath)) removed += 1
    }
    removed
  }

  /** MERGE INTO the table: apply a keyed changeset (insert / update /
    * delete ops, [[graft.operators.Relational.applyChanges]]
    * semantics) against the live snapshot and commit the result as a
    * new overwrite version — copy-on-write DML, the lakehouse
    * update path. One read of the live set + one key join + one
    * rewrite; at 100 TB the rewrite narrows to the files whose key
    * ranges the changeset touches (the log's min/max make that file
    * set computable — documented refinement, same skip machinery as
    * [[prunedRead]]). Returns the new version.
    */
  def merge(spark: SparkSession, dir: String, changes: DataFrame,
      keys: Seq[String], payload: Seq[String], opCol: String,
      statCol: String): Long = {
    val next = graft.operators.Relational.applyChanges(
      read(spark, dir), changes, keys, payload, opCol)
    commit(next, dir, "overwrite", statCol)
  }

  /** Incremental (CDC-style) read: the rows ADDED by versions in
    * (sinceVersion, untilVersion] — resolved purely from the log, so
    * a downstream consumer pulls exactly the new files of the
    * commits it hasn't seen, never rescanning the table. This is the
    * table format AS an incremental source: checkpoint = last
    * version consumed. Append-only semantics — an overwrite in range
    * is rejected, because its delta is not expressible as
    * added-rows-only (a full CDC feed would need remove entries;
    * [[liveFiles]]' watermark handles overwrites for snapshot
    * readers).
    */
  def incrementalRead(spark: SparkSession, dir: String,
      sinceVersion: Long, untilVersion: Long): DataFrame = {
    val lg = log(spark, dir)
      .filter(col("version") > sinceVersion &&
        col("version") <= untilVersion)
    require(lg.filter(col("mode") === "overwrite").isEmpty,
      s"incrementalRead range ($sinceVersion, $untilVersion] contains " +
        "an overwrite — its delta is not added-rows-only")
    val paths = lg.select(col("path")).collect()
      .map(r => s"$dir/${r.getString(0)}")
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      read(spark, dir).schema)
    if (paths.isEmpty) empty
    else spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** Range read with LOG-LEVEL file pruning: only files whose
    * [mn, mx] overlaps [lo, hi] are opened at all; the residual
    * filter still applies row-level inside survivors. Exactly the
    * data-skipping contract of the q142 zonemap, hoisted into the
    * table format where a 100 TB reader needs it (skip before scan).
    */
  def prunedRead(spark: SparkSession, dir: String, statCol: String,
      lo: Long, hi: Long, asOf: Option[Long] = None): DataFrame = {
    val kept = liveFiles(spark, dir, asOf)
      .filter(col("mx") >= lo && col("mn") <= hi)
      .select(col("path")).collect().map(r => s"$dir/${r.getString(0)}")
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      read(spark, dir, asOf).schema)
    if (kept.isEmpty) empty
    else spark.read.parquet(kept.toIndexedSeq: _*)
      .filter(col(statCol) >= lo && col(statCol) <= hi)
  }
}
