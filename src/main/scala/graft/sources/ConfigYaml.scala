package graft.sources

import scala.collection.mutable

/** S9 — driver-side config documents (SURVEY §2.1 S9; reference
  * index.yaml / config_general.yaml / config_downloads.yaml with
  * `defaults` inheritance, base.py:950-976).
  *
  * The container has no YAML dependency, so this parses the small
  * indentation-nested subset the reference's configs actually use:
  * nested string-keyed maps, scalar leaves, `#` comments, and inline
  * empty values. Not a general YAML parser — config documents only
  * (never data-plane).
  */
object ConfigYaml {

  sealed trait Node
  final case class Scalar(value: String) extends Node
  final case class Mapping(entries: Map[String, Node]) extends Node {
    def apply(key: String): Node = entries(key)
    def get(key: String): Option[Node] = entries.get(key)
    def scalar(key: String): Option[String] = entries.get(key).collect {
      case Scalar(v) => v
    }
  }

  /** Parse an indentation-nested mapping document. */
  def parse(text: String): Mapping = {
    val lines = text.split("\n").toIndexedSeq
      .map(l => l.takeWhile(_ != '#')) // strip comments
      .filter(_.trim.nonEmpty)
      .map { l =>
        val indent = l.takeWhile(_ == ' ').length
        val body = l.trim
        val idx = body.indexOf(':')
        require(idx > 0, s"unsupported config line: $l")
        val key = unquote(body.take(idx).trim)
        val value = body.drop(idx + 1).trim
        (indent, key, value)
      }

    def build(from: Int, to: Int, indent: Int): Mapping = {
      val entries = mutable.LinkedHashMap[String, Node]()
      var i = from
      while (i < to) {
        val (ind, key, value) = lines(i)
        require(ind == indent, s"inconsistent indentation at ${lines(i)}")
        // children = following lines with deeper indent
        var j = i + 1
        while (j < to && lines(j)._1 > indent) j += 1
        if (j > i + 1) entries(key) = build(i + 1, j, lines(i + 1)._1)
        else if (value.nonEmpty) entries(key) = Scalar(unquote(value))
        else entries(key) = Mapping(Map.empty)
        i = j
      }
      Mapping(entries.toMap)
    }
    if (lines.isEmpty) Mapping(Map.empty) else build(0, lines.size, lines.head._1)
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  /** The reference's config_downloads semantics: every catalog section
    * inherits the `defaults` section, overriding per-key
    * (base.py:950-976). Returns catalogId -> merged flat params. */
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
        catalogId -> (defaults ++ m.entries.collect {
          case (k, Scalar(v)) => k -> v
        })
    }
  }

  /** index.yaml shape: catalogId -> {url, formato}. */
  def catalogIndex(doc: Mapping): Map[String, (String, String)] =
    doc.entries.collect {
      case (id, m: Mapping) =>
        id -> ((m.scalar("url").getOrElse(""),
          m.scalar("formato").getOrElse("json")))
    }
}
