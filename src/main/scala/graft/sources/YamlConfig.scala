package graft.sources

import scala.io.Source

/** S17: driver-side YAML config (`Objects/Config.py:22-47`,
  * `powerbi_main_script.py:68-69`). The reference's `config.yml` /
  * `vco_list.yml` use exactly one shape — top-level sections with one
  * level of `key: value` entries — so a dependency-free subset parser
  * covers it (zero-egress build: no YAML library available, and none
  * needed).
  *
  * Parsed values: `null` → None, `true`/`false` → the strings are kept
  * verbatim (the reference reads them through PyYAML into bools; our
  * consumers coerce explicitly via [[VcoEntry]]).
  */
object YamlConfig {

  /** section → key → value (null literals omitted). */
  def parse(text: String): Map[String, Map[String, String]] = {
    val result = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    for (raw <- text.linesIterator) {
      // comment strip honors quoting: a '#' inside "..." or '...' is data
      val noComment = {
        var quote: Char = 0
        var cut = -1
        var i = 0
        while (i < raw.length && cut < 0) {
          val ch = raw.charAt(i)
          if (quote != 0) { if (ch == quote) quote = 0 }
          else if (ch == '"' || ch == '\'') quote = ch
          else if (ch == '#') cut = i
          i += 1
        }
        if (cut >= 0) raw.substring(0, cut) else raw
      }
      if (noComment.trim.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val line = noComment.trim
        val colon = line.indexOf(':')
        if (colon >= 0) {
          val key = line.substring(0, colon).trim
          val value = line.substring(colon + 1).trim
          if (!indented && value.isEmpty) {
            current = Some(key)
            result.getOrElseUpdate(key,
              scala.collection.mutable.LinkedHashMap.empty)
          } else current.foreach { section =>
            if (value.nonEmpty && value != "null")
              result(section)(key) = stripQuotes(value)
          }
        }
      }
    }
    result.map { case (k, v) => k -> v.toMap }.toMap
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 &&
        ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  def parseFile(path: String): Map[String, Map[String, String]] = {
    val src = Source.fromFile(path)
    try parse(src.mkString) finally src.close()
  }

  /** One VCO registry entry (`vco_list.yml` shape). */
  final case class VcoEntry(name: String, link: Option[String],
      skip: Boolean, token: Option[String], username: Option[String])

  def vcoList(parsed: Map[String, Map[String, String]]): Seq[VcoEntry] =
    parsed.toSeq.map { case (section, kv) =>
      VcoEntry(
        name = kv.getOrElse("name", section),
        link = kv.get("link"),
        skip = kv.get("skip").contains("true"),
        token = kv.get("token"),
        username = kv.get("username"))
    }
}
