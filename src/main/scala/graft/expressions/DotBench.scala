package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev tool: portable-vs-native dot product throughput on the
  * embeddings cross product. Usage: tools/run.sh graft.expressions.DotBench [sfDir]
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, sfDir)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(broadcast(e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("ib"), col("embedding").as("b"))))
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("portable aggregate(zip_with)")(
      pairs.select(sum(Similarity.dot(col("a"), col("b"))).as("s")))
    time("native codegen expression")(
      pairs.select(sum(VectorExpressions.dotF(col("a"), col("b"))).as("s")))
    spark.stop()
  }
}
