package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/epoch scalar functions (SURVEY §2.7 F6–F10). */
object Dates {

  /** F6: the reference's payload timestamp pattern
    * (`'%Y-%m-%dT%H:%M:%S.%fZ'`, `powerbi_main_fun.py:412,848`).
    * Python's `%f` accepts 1–6 fractional digits; a fixed `SSS`
    * pattern would null out micro-second payloads, so the Z is
    * stripped and Spark's default parser (variable fraction) takes
    * over.
    */
  def parseIso(c: Column): Column =
    to_timestamp(regexp_replace(c, "Z$", ""))

  /** F7 `datetime_to_epoch_ms` (`powerbi_main_fun.py:1700-1701`):
    * `int(dtm.timestamp()) * 1000` — seconds are TRUNCATED before the
    * ms scale-up, so sub-second precision is deliberately dropped.
    */
  def epochMs(c: Column): Column = unix_timestamp(c) * 1000

  /** F7 `converttohuman` (`powerbi_main_fun.py:1704-1706`): note the
    * reference's DOUBLE space between date and time.
    */
  def toHuman(epochMsCol: Column): Column =
    date_format(timestamp_millis(epochMsCol), "yyyy-MM-dd  HH:mm:ss")

  /** F9 month-floor alert stamp (`powerbi_main_fun.py:886-887,942`):
    * `strftime('%Y-%m-01T00:00:00.000Z')[:-3]` — the trailing
    * `[:-3]` slices "00Z" off the LITERAL format, yielding
    * `…T00:00:00.0`. Reproduced exactly, quirk included.
    */
  def monthFloorAlertDate(c: Column): Column =
    concat(date_format(c, "yyyy-MM"), lit("-01T00:00:00.0"))

  /** F8: whole-day difference (`activated_days`,
    * `powerbi_main_fun.py:1117-1122`).
    */
  def daysBetween(later: Column, earlier: Column): Column =
    datediff(later, earlier)

  /** F10: bytes-per-tick → Mbps (`powerbi_main_fun.py:1976-1978`). */
  def toMbps(bytes: Column, tickIntervalSec: Column): Column =
    round(bytes * 8 / (tickIntervalSec * 1000 * 1000), 3)
}
