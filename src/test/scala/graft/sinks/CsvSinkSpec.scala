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
}
