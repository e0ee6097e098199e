package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class CsvSinkSpec extends SparkSpec {

  test("writes a single headered csv when asked") {
    import spark.implicits._
    val dir = Files.createTempDirectory("csvsink").toString + "/out"
    CsvSink.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir,
      singleFile = true)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.util.Using(scala.io.Source.fromFile(files.head))(
      _.getLines().toSeq).get
    assert(lines.head === "id,v")
    assert(lines.tail.sorted === Seq("1,a", "2,b"))
  }

  test("partitioned layout: a partition-column filter prunes the scan (q179)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune_spec")
    try {
      Seq((1L, "en"), (2L, "de"), (3L, "en"))
        .toDF("id", "lang")
        .write.partitionBy("lang").parquet(s"$tmp/c")
      val read = spark.read.parquet(s"$tmp/c")
        .filter(org.apache.spark.sql.functions.col("lang") === "en")
      val plan = read.queryExecution.executedPlan.toString
      // the filter must land in PartitionFilters (directory pruning),
      // not survive as a post-scan Filter over all partitions
      assert(plan.contains("PartitionFilters: [isnotnull(lang"),
        s"partition filter not pushed:\n$plan")
      assert(read.select("id").collect().map(_.getLong(0)).sorted
        === Array(1L, 3L))
    } finally {
      java.nio.file.Files.walk(tmp)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }

  test("maxRecordsPerFile splits one task's output into capped files (q183)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mrpf_spec")
    try {
      (1L to 250L).toDF("id").repartition(1)
        .write.option("maxRecordsPerFile", 100).parquet(s"$tmp/c")
      val files = new java.io.File(s"$tmp/c").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 3) // 100 + 100 + 50
      val back = spark.read.parquet(s"$tmp/c")
      assert(back.count() === 250L)
      // every file respects the cap
      files.foreach { f =>
        assert(spark.read.parquet(f.getPath).count() <= 100L)
      }
    } finally {
      java.nio.file.Files.walk(tmp)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }
}
