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

  test("comment stripping is quote-aware ('#' inside urls survives)") {
    val doc = ConfigYaml.parse(
      """url: "http://host/page#frag"   # real comment
        |plain: http://host/a#b
        |""".stripMargin)
    assert(doc.scalar("url").contains("http://host/page#frag"))
    // unquoted: YAML only comments on whitespace+'#', so '#b' survives
    assert(doc.scalar("plain").contains("http://host/a#b"))
  }

  test("downloadConfig merges defaults into catalog AND sources (base.py:950-976)") {
    val doc = ConfigYaml.parse(
      """defaults:
        |  tries: 5
        |  retry_delay: 2
        |sspm:
        |  catalog:
        |    try_timeout: 10
        |  sources:
        |    tries: 1
        |    proxies:
        |      http: http://proxy.internal:3128
        |""".stripMargin)
    val cfg = ConfigYaml.downloadConfig(doc, "sspm")
    assert(cfg("catalog") == Map("tries" -> "5", "retry_delay" -> "2",
      "try_timeout" -> "10"))
    assert(cfg("sources") == Map("tries" -> "1", "retry_delay" -> "2",
      "proxies.http" -> "http://proxy.internal:3128"))
    // unknown catalog still yields both subsections with pure defaults
    val dflt = ConfigYaml.downloadConfig(doc, "nope")
    assert(dflt("catalog") == Map("tries" -> "5", "retry_delay" -> "2"))
    assert(dflt("sources") == dflt("catalog"))
    // and the Ingest param mapping (seconds -> ms, proxy host:port)
    val dc = graft.sources.Ingest.DownloadConfig.fromParams(cfg("sources"))
    assert(dc.tries == 1 && dc.retryDelayMs == 2000L)
    assert(dc.proxyHost.contains("proxy.internal") && dc.proxyPort == 3128)
  }

  test("withDefaults fails loudly on nested catalog sections") {
    val doc = ConfigYaml.parse(
      """defaults:
        |  tries: 3
        |sspm:
        |  catalog:
        |    timeout: 9
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](ConfigYaml.withDefaults(doc))
    assert(e.getMessage.contains("downloadConfig"))
  }

  test("config_email.yaml: mailer + per-stage destinatarios (base.py:1098-1109)") {
    val doc = ConfigYaml.parse(
      """mailer:
        |  user: reports@example.org
        |  password: hunter2
        |  smtp_server: smtp.example.org
        |  port: 465
        |  ssl: true
        |extraccion:
        |  sspm:
        |    destinatarios:
        |      - ana@example.org
        |      - "luis@example.org"
        |scraping:
        |  sspm:
        |    destinatarios:
        |      - ops@example.org
        |""".stripMargin)
    val m = ConfigYaml.mailer(doc).get
    assert(m == ConfigYaml.MailerConfig("reports@example.org", "hunter2",
      "smtp.example.org", 465, ssl = true))
    assert(ConfigYaml.recipients(doc, "extraccion", "sspm") ==
      Seq("ana@example.org", "luis@example.org"))
    assert(ConfigYaml.recipients(doc, "scraping", "sspm") ==
      Seq("ops@example.org"))
    // unconfigured catalog/stage -> empty -> sender skips (reference)
    assert(ConfigYaml.recipients(doc, "extraccion", "otro").isEmpty)
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
