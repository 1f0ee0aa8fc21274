package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ConfigYaml

/** S9 — config subset parser + the defaults-inheritance semantics. */
class ConfigYamlSpec extends AnyFunSuite {

  test("index.yaml shape parses to catalog entries") {
    val doc = ConfigYaml.parse(
      """# catalogs to process
        |sspm:
        |  url: "http://example.org/sspm/data.json"
        |  formato: json
        |otro:
        |  url: http://example.org/otro/catalog.xlsx
        |  formato: xlsx
        |""".stripMargin)
    val idx = ConfigYaml.catalogIndex(doc)
    assert(idx("sspm") == (("http://example.org/sspm/data.json", "json")))
    assert(idx("otro") == (("http://example.org/otro/catalog.xlsx", "xlsx")))
  }

  test("config_downloads defaults inheritance merges per catalog") {
    val doc = ConfigYaml.parse(
      """defaults:
        |  tries: 3
        |  timeout: 30
        |sspm:
        |  timeout: 90
        |vacio:
        |""".stripMargin)
    val merged = ConfigYaml.withDefaults(doc)
    assert(merged("sspm") == Map("tries" -> "3", "timeout" -> "90"))
    assert(merged("vacio") == Map("tries" -> "3", "timeout" -> "30"))
    assert(!merged.contains("defaults"))
  }

  test("nested general config with comments and quotes") {
    val doc = ConfigYaml.parse(
      """host: "https://datos.example.org"  # public host
        |environment: staging
        |logging:
        |  level: INFO
        |""".stripMargin)
    assert(doc.scalar("host").contains("https://datos.example.org"))
    assert(doc.scalar("environment").contains("staging"))
    val logging = doc("logging").asInstanceOf[ConfigYaml.Mapping]
    assert(logging.scalar("level").contains("INFO"))
  }
}
