package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class YamlConfigSpec extends AnyFunSuite {

  test("parses sectioned key-value yaml with comments, nulls, quotes") {
    val parsed = YamlConfig.parse(
      """# header comment
        |MYSQL_PROD:
        |  user: admin
        |  password: "p#ss"
        |  port: 3306
        |  opt: null
        |
        |FILES:
        |  logging: log.txt
        |""".stripMargin)
    assert(parsed("MYSQL_PROD") === Map(
      "user" -> "admin", "password" -> "p#ss", "port" -> "3306"))
    assert(parsed("FILES") === Map("logging" -> "log.txt"))
  }

  test("vcoList maps registry entries with skip/null handling") {
    val vcos = YamlConfig.vcoList(YamlConfig.parse(
      """vco1:
        |  name: vco1
        |  link: vco1.example.net
        |  skip: false
        |  token: abc
        |vco2:
        |  name: vco2
        |  link: vco2.example.net
        |  skip: true
        |  username: u@example.net
        |""".stripMargin)).sortBy(_.name)
    assert(vcos.map(_.name) === Seq("vco1", "vco2"))
    assert(vcos.head.token === Some("abc"))
    assert(!vcos.head.skip && vcos(1).skip)
    assert(vcos(1).username === Some("u@example.net"))
  }

  test("the real reference config files parse when present") {
    val cfg = "/root/reference/DataFiles/config.yml"
    if (new java.io.File(cfg).exists()) {
      val parsed = YamlConfig.parseFile(cfg)
      assert(parsed("MYSQL_PROD")("port") === "3306")
      assert(parsed("FILES")("countries") === "DataFiles/country.json")
    }
    val vl = "/root/reference/DataFiles/vco_list.yml"
    if (new java.io.File(vl).exists()) {
      val vcos = YamlConfig.vcoList(YamlConfig.parseFile(vl))
      assert(vcos.nonEmpty)
      assert(vcos.forall(_.link.isDefined))
    }
  }
}
