package graft.sinks

import org.apache.spark.sql.DataFrame

/** K6: CSV sink (`powerbi_main_fun.py:906-934` dumps app-id QoS rules
  * to a csv path). The reference appends row-by-row with a Python
  * `csv.writer`; here it is a parallel columnar write — one file per
  * partition, so `coalesce` first when a single file is required
  * (driver-side tooling only; never in a 100 TB path).
  */
object CsvSink {
  def write(df: DataFrame, path: String, header: Boolean = true,
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", header.toString).csv(path)
  }
}
