package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC-ish crawl-container handling: build and parse concatenated
  * length-prefixed records (the ISO 28500 WARC shape: header lines,
  * `Content-Length: N`, blank line, N payload octets, blank line,
  * next record). The reference has no analog; web-archive ingest is
  * the step BEFORE [[HtmlExtract]] in a pretraining pipeline.
  *
  * The parser walks records by Content-Length — never by scanning for
  * record markers — so payloads that themselves contain `WARC/1.0`
  * banners or CRLFCRLF header terminators (any real HTML archive has
  * them) cannot derail it; the q336 fixture plants exactly that trap.
  * The walk is a bounded catalyst `aggregate` fold over the container
  * string: per step, locate the header terminator, read
  * Content-Length, jump. All pure column algebra — codegen'd, rides
  * the scan, no UDF, no driver state; one container parses
  * independently per row, so 100 TB of archives parallelize by file
  * exactly like the binaryFile ingest (q303) they'd ride in on.
  *
  * Offset contract: offsets are CHARACTER positions, exact for
  * single-byte (ASCII/latin-1) container bytes — the fixture keeps
  * payloads ASCII. A production binary path swaps the string substr
  * for binary slicing at the same offsets; the walk algebra is
  * unchanged.
  */
object Warc {

  private val crlf2 = "\r\n\r\n"

  /** One record's wire form for `uri`/`payload` (payload octet length
    * computed in-plan). The URI must not contain CR/LF — a newline in
    * it would forge header lines; [[parseRecords]] reads the URI up
    * to the first CR, so a forged record mis-parses loudly (length
    * walk breaks), never silently.
    */
  def record(uri: Column, payload: Column): Column =
    concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
      uri, lit("\r\nContent-Length: "), length(payload).cast("long"),
      lit(crlf2), payload, lit(crlf2))

  /** Concatenate per-row records into one container per `fileCol`
    * group, in ascending `idCol` order (sort_array over a keyed
    * struct — collect_list alone is partition-ordered).
    */
  def buildContainers(df: DataFrame, fileCol: String, idCol: String,
      uriCol: String, payloadCol: String): DataFrame =
    df.groupBy(col(fileCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(idCol),
            record(col(uriCol), col(payloadCol)).as("__rec")))),
          x => x.getField("__rec")),
        "").as("warc"))

  /** Parse a container column back into records: (fileCol, rec_idx,
    * target_uri, content_length, payload). `maxRecords` bounds the
    * fold (steps past the final record no-op); `maxHeaderLen` bounds
    * the per-step header-terminator search, so one step costs
    * O(maxHeaderLen), not O(remaining container). Records not
    * starting with the `WARC/1.0` banner — torn tails, trailing
    * garbage — and records whose header exceeds the bound terminate
    * the walk rather than yielding junk rows.
    */
  def parseRecords(df: DataFrame, fileCol: String, warcCol: String,
      maxRecords: Int, maxHeaderLen: Long = 1024L): DataFrame = {
    require(maxRecords >= 1, s"maxRecords must be >= 1, got $maxRecords")
    require(maxHeaderLen >= 16L,
      s"maxHeaderLen must be >= 16, got $maxHeaderLen")
    val s = col(warcCol)
    val n = length(s).cast("long")
    val init = array().cast(
      "array<struct<off:bigint,hend:bigint,len:bigint>>")
    val acc = aggregate(
      sequence(lit(1), lit(maxRecords)), init,
      (a, _) => {
        val last = element_at(a, -1)
        // trailing CRLFCRLF (4) after the payload; header terminator
        // CRLFCRLF (4) sits between hend and the payload
        val off = when(size(a) === 0, lit(1L))
          .otherwise(last.getField("hend") + last.getField("len") + 8L)
        // search only a bounded header window, not the whole
        // remaining container — keeps each step O(maxHeaderLen)
        // instead of O(n − off); a record whose header exceeds the
        // bound terminates the walk like any other malformed record
        val rel = locate(crlf2, s.substr(off, lit(maxHeaderLen)))
          .cast("long")
        val hend = off + rel - 1
        val hdr = s.substr(off, hend - off)
        val len = coalesce(
          regexp_extract(hdr, "Content-Length: (\\d+)", 1)
            .cast("long"), lit(-1L))
        // hend+3+len is the payload's last char: a torn tail (crash
        // mid-write) is dropped, not emitted with a short payload
        val ok = off <= n && rel > 0 && len >= 0 &&
          s.substr(off, lit(8L)) === "WARC/1.0" &&
          hend + 3L + len <= n
        when(ok, concat(a, array(struct(off.as("off"), hend.as("hend"),
          len.as("len"))))).otherwise(a)
      })
    df.select(col(fileCol), s.as("__s"),
        posexplode(acc).as(Seq("rec_idx", "r")))
      .select(col(fileCol), col("rec_idx").cast("long").as("rec_idx"),
        regexp_extract(
          col("__s").substr(col("r.off"), col("r.hend") - col("r.off")),
          "WARC-Target-URI: ([^\r]+)", 1).as("target_uri"),
        col("r.len").as("content_length"),
        col("__s").substr(col("r.hend") + 4L, col("r.len")).as("payload"))
  }
}
