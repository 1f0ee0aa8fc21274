package graft.sources

import scala.collection.mutable

/** S9 — driver-side config documents (SURVEY §2.1 S9; reference
  * index.yaml / config_general.yaml / config_downloads.yaml with
  * `defaults` inheritance, base.py:950-976; config_email.yaml,
  * base.py:1098-1109).
  *
  * The container has no YAML dependency, so this parses the small
  * indentation-nested subset the reference's configs actually use:
  * nested string-keyed maps, scalar leaves, `- item` sequences, `#`
  * comments, and inline empty values. Not a general YAML parser —
  * config documents only (never data-plane).
  */
object ConfigYaml {

  sealed trait Node
  final case class Scalar(value: String) extends Node
  final case class Sequence(items: Seq[Node]) extends Node {
    def scalars: Seq[String] = items.collect { case Scalar(v) => v }
  }
  final case class Mapping(entries: Map[String, Node]) extends Node {
    def apply(key: String): Node = entries(key)
    def get(key: String): Option[Node] = entries.get(key)
    def scalar(key: String): Option[String] = entries.get(key).collect {
      case Scalar(v) => v
    }
    def mapping(key: String): Option[Mapping] = entries.get(key).collect {
      case m: Mapping => m
    }
    def sequence(key: String): Option[Sequence] = entries.get(key).collect {
      case s: Sequence => s
    }
  }

  /** YAML treats '#' as a comment only at line start or after
    * whitespace, and never inside quotes — a naive takeWhile truncates
    * values like "http://host/page#frag". */
  private def stripComment(line: String): String = {
    var quote: Char = 0
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '#' && (i == 0 || line(i - 1) == ' ' || line(i - 1) == '\t'))
        return line.take(i)
      i += 1
    }
    line
  }

  /** Parse an indentation-nested document (mapping at the root). */
  def parse(text: String): Mapping = {
    val lines = text.split("\n").toIndexedSeq
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map(l => (l.takeWhile(_ == ' ').length, l.trim))

    def build(from: Int, to: Int): Node = {
      val indent = lines(from)._1
      if (lines(from)._2.startsWith("-")) {
        // sequence of scalar items at this indent
        val items = mutable.ArrayBuffer[Node]()
        var i = from
        while (i < to) {
          val (ind, body) = lines(i)
          require(ind == indent && body.startsWith("-"),
            s"unsupported sequence line: ${lines(i)}")
          items += Scalar(unquote(body.drop(1).trim))
          i += 1
        }
        Sequence(items.toSeq)
      } else {
        val entries = mutable.LinkedHashMap[String, Node]()
        var i = from
        while (i < to) {
          val (ind, body) = lines(i)
          require(ind == indent, s"inconsistent indentation at ${lines(i)}")
          val idx = body.indexOf(':')
          require(idx > 0, s"unsupported config line: $body")
          val key = unquote(body.take(idx).trim)
          val value = body.drop(idx + 1).trim
          // children = following lines with deeper indent
          var j = i + 1
          while (j < to && lines(j)._1 > indent) j += 1
          if (j > i + 1) entries(key) = build(i + 1, j)
          else if (value.nonEmpty) entries(key) = Scalar(unquote(value))
          else entries(key) = Mapping(Map.empty)
          i = j
        }
        Mapping(entries.toMap)
      }
    }
    if (lines.isEmpty) Mapping(Map.empty)
    else build(0, lines.size) match {
      case m: Mapping => m
      case other => Mapping(Map("" -> other))
    }
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  /** Defaults inheritance over a FLAT config (catalogId -> scalar
    * params). Catalog sections with nested mappings are rejected loudly
    * — the reference's two-level shape goes through [[downloadConfig]]
    * instead. */
  def withDefaults(doc: Mapping,
      defaultsKey: String = "defaults"): Map[String, Map[String, String]] = {
    val defaults: Map[String, String] = doc.get(defaultsKey) match {
      case Some(m: Mapping) => m.entries.collect {
        case (k, Scalar(v)) => k -> v
      }
      case _ => Map.empty
    }
    doc.entries.collect {
      case (catalogId, m: Mapping) if catalogId != defaultsKey =>
        m.entries.foreach {
          case (k, _: Mapping) if m.entries(k) != Mapping(Map.empty) =>
            throw new IllegalArgumentException(
              s"withDefaults expects flat params; '$catalogId.$k' is " +
                "nested — use downloadConfig for the catalog/sources shape")
          case _ =>
        }
        catalogId -> (defaults ++ m.entries.collect {
          case (k, Scalar(v)) => k -> v
        })
    }
  }

  /** The reference's `get_catalog_download_config` (base.py:950-976):
    * each catalog section carries `catalog` and `sources` sub-sections
    * (download params for the catalog document itself vs its source
    * files); every top-level `defaults` key fills into EACH sub-section
    * where absent. Returns subsection name -> merged params; both
    * `catalog` and `sources` always present. */
  def downloadConfig(doc: Mapping,
      catalogId: String): Map[String, Map[String, String]] = {
    val defaults: Map[String, String] = doc.mapping("defaults")
      .map(_.entries.collect { case (k, Scalar(v)) => k -> v })
      .getOrElse(Map.empty)
    val catalogSection: Map[String, Node] =
      doc.mapping(catalogId).map(_.entries).getOrElse(Map.empty)
    val withRequired = Seq("catalog", "sources")
      .foldLeft(catalogSection) { (m, k) =>
        if (m.contains(k)) m else m + (k -> Mapping(Map.empty))
      }
    withRequired.collect { case (name, sub: Mapping) =>
      // one nested level flattens dotted (the reference's
      // `proxies: {http: …, https: …}` shape, download.py:27-33)
      val params = sub.entries.flatMap {
        case (k, Scalar(v)) => Seq(k -> v)
        case (k, m: Mapping) => m.entries.collect {
          case (k2, Scalar(v)) => s"$k.$k2" -> v
        }
        case _ => Seq.empty
      }
      name -> (defaults ++ params)
    }
  }

  /** index.yaml shape: catalogId -> {url, formato}. */
  def catalogIndex(doc: Mapping): Map[String, (String, String)] =
    doc.entries.collect {
      case (id, m: Mapping) =>
        id -> ((m.scalar("url").getOrElse(""),
          m.scalar("formato").getOrElse("json")))
    }

  // ------------------------------------------------------- config_email

  /** SMTP server settings (reference `mailer` section + smtplib usage,
    * base.py:728-739). */
  final case class MailerConfig(user: String, password: String,
      smtpServer: String, port: Int, ssl: Boolean)

  /** config_email.yaml (base.py:1098-1109): a `mailer` section plus one
    * section per stage ('extraccion', 'scraping') mapping catalogId ->
    * destinatarios list (base.py:744-816). */
  def mailer(doc: Mapping): Option[MailerConfig] =
    doc.mapping("mailer").map { m =>
      MailerConfig(
        m.scalar("user").getOrElse(""),
        m.scalar("password").getOrElse(""),
        m.scalar("smtp_server").getOrElse(""),
        m.scalar("port").flatMap(_.toIntOption).getOrElse(25),
        m.scalar("ssl").exists(v =>
          v.equalsIgnoreCase("true") || v.equalsIgnoreCase("yes")))
    }

  /** Recipients for a stage + catalog (`destinatarios`,
    * base.py:760-764). Empty when unconfigured — the caller skips the
    * send, as the reference does. */
  def recipients(doc: Mapping, stage: String, catalogId: String): Seq[String] =
    doc.mapping(stage)
      .flatMap(_.mapping(catalogId))
      .flatMap(_.sequence("destinatarios"))
      .map(_.scalars)
      .getOrElse(Seq.empty)
}
