package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S18/J4: the country lookup dimension and its case-insensitive
  * broadcast enrichment.
  *
  * The reference loads `DataFiles/country.json` (249 rows of
  * {ISO, Country, REG}) per run and probes it with Python loops
  * (`powerbi_main_fun.py:645,688-690,731-733`): REG becomes the
  * "Geospecific" gold column. A 249-row dim is the canonical
  * broadcast join — the fact side never moves.
  */
object CountryDim {

  val schema: StructType = StructType(Seq(
    StructField("ISO", StringType),
    StructField("Country", StringType),
    StructField("REG", StringType)))

  /** Read the dim from a JSON file (the reference's own format: a
    * top-level array works with multiLine).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)

  /** J4: attach `Geospecific` (= REG) by case-insensitive ISO match,
    * falling back to case-insensitive full-name match — exactly the
    * reference's two probe forms (`powerbi_main_fun.py:688-690,
    * 784-786`). Both probes are one broadcast left join each.
    */
  def enrich(fact: DataFrame, dim: DataFrame, codeCol: String): DataFrame = {
    val byIso = dim.select(lower(col("ISO")).as("__iso"), col("REG").as("__reg_iso"))
    val byName = dim.select(lower(col("Country")).as("__cname"),
      col("REG").as("__reg_name"))
    fact
      .join(broadcast(byIso), lower(col(codeCol)) === col("__iso"), "left")
      .join(broadcast(byName), lower(col(codeCol)) === col("__cname"), "left")
      .withColumn("Geospecific", coalesce(col("__reg_iso"), col("__reg_name")))
      .drop("__iso", "__reg_iso", "__cname", "__reg_name")
  }
}
