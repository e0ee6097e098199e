package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide→tall EAV melt (SURVEY §1.1 EAV store, K5).
  *
  * The reference maintains `*Attributes` tables of
  * (uuid, name, used, num, text, filter_val) rows, written one attribute
  * at a time with one MySQL round-trip + commit each
  * (`fun_mysql_inserts.py:347-374`, wrappers `Functions/sql_upserts.py:
  * 51-88`). Here the whole attribute set is derived as columns of one
  * wide frame and melted in a single narrow pass with `stack` — no
  * shuffle at all (it's a generator projection), and the downstream
  * upsert writes one batch per partition instead of one statement per
  * attribute.
  */
object Melt {

  /** Melt `numAttrs` (numeric) and `textAttrs` (string) columns of `df`
    * into EAV rows keyed by `uuid`. `filter_val` defaults to
    * `"{name}-{used}"` exactly as `fun_mysql_inserts.py:352-353`.
    */
  def toEav(df: DataFrame, uuid: String,
      numAttrs: Seq[String], textAttrs: Seq[String]): DataFrame = {
    val n = numAttrs.size + textAttrs.size
    val pairs: Seq[Column] =
      numAttrs.flatMap(a => Seq(lit(a), col(a).cast("double"),
                                lit(null).cast("string"))) ++
      textAttrs.flatMap(a => Seq(lit(a), lit(null).cast("double"),
                                 col(a).cast("string")))
    val stacked = df.select(
      col(uuid).as("uuid"),
      stack((lit(n) +: pairs): _*).as(Seq("name", "num", "text")))
    stacked
      .withColumn("used", col("num").isNotNull || col("text").isNotNull)
      .withColumn("filter_val",
        concat_ws("-", col("name"), col("used").cast("string")))
      .select(col("uuid"), col("name"), col("used"), col("num"),
              col("text"), col("filter_val"))
      .orderBy(col("uuid"), col("name"))
  }
}
