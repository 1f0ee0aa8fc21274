package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal draft-04 JSON-Schema reader that DRIVES [[CatalogValidator]]
  * from schema *files* instead of hand-coded rules — the reference
  * validates its catalog against `config/schemas/<name>.json` via a generic
  * validator (`base.py:423-453`), so a schema-file edit there changes
  * enforcement with no code change; this gives the engine the same
  * property.
  *
  * Supported subset — exactly what the catalog profile's schemas use:
  *  - top-level `required` arrays;
  *  - per-property `pattern`, directly or as string-branches under
  *    `anyOf` (value valid if ANY pattern matches — draft-04 anyOf);
  *  - `format`: `email` / `uri`, compiled to the same regexes the
  *    validator always used;
  *  - `$ref` fragments of the profile's mixed-types vocabulary:
  *    `#temporalOrNull` (ISO interval pattern + start ≤ end ordering).
  *  - one level of object nesting (`publisher.mbox`,
  *    `contactPoint.hasEmail`) via `properties` recursion.
  * Null / empty-string branches (`{"type":"null"}`, `maxLength: 0`)
  * express optionality, which the validator already honors by guarding
  * every check with non-empty; they parse as no-ops.
  */
object SchemaRules {

  /** draft-04 `format: email`. */
  val EmailPattern = "^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"

  /** draft-04 `format: uri` — absolute URI with a scheme. */
  val UriPattern = "^[a-zA-Z][a-zA-Z0-9+.\\-]*:\\S+$"

  /** `temporalOrNull` ISO interval: two ISO date(/time)s joined by '/'. */
  val TemporalPattern =
    "^\\d{4}-\\d{2}-\\d{2}(T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?)?(([+-]\\d{2}:\\d{2})|Z)?" +
      "/\\d{4}-\\d{2}-\\d{2}(T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?)?(([+-]\\d{2}:\\d{2})|Z)?$"

  /** One string-property constraint: `path` is the (possibly nested)
    * column path, `patterns` the alternatives the value must match one
    * of, `kind` drives the violation rule string ("email" / "uri" /
    * "temporal" / "pattern"). */
  final case class PropRule(path: Seq[String], patterns: Seq[String],
      kind: String) {
    def dotted: String = path.mkString(".")
    def rule: String = kind match {
      case "email" => s"invalid email: $dotted"
      case "uri" => s"invalid uri: $dotted"
      case "temporal" => "invalid temporal interval"
      case _ => s"invalid $dotted"
    }
  }

  /** Parsed per-level schema: required top-level keys + property
    * constraints. */
  final case class LevelSchema(required: Seq[String], rules: Seq[PropRule])

  private val mapper = new ObjectMapper()

  def parse(json: String): LevelSchema = {
    val root = mapper.readTree(json)
    val required = Option(root.get("required")).toSeq
      .flatMap(_.elements().asScala).map(_.asText())
    LevelSchema(required, propRules(root, Seq.empty))
  }

  /** Recurse `properties`, one object level deep in practice (the
    * depth the profile uses); arrays-of-$ref (dataset.distribution)
    * describe OTHER levels and are skipped here — each level view is
    * validated against its own schema file. */
  private def propRules(node: JsonNode, at: Seq[String]): Seq[PropRule] =
    Option(node.get("properties")).toSeq.flatMap { props =>
      props.properties().asScala.toSeq.flatMap { e =>
        val (name, spec) = (e.getKey, e.getValue)
        val path = at :+ name
        ruleOf(spec, path).toSeq ++
          (if (spec.path("type").asText() == "object")
            propRules(spec, path)
          else Seq.empty)
      }
    }

  /** The constraint a single property spec encodes, if any. */
  private def ruleOf(spec: JsonNode, path: Seq[String]): Option[PropRule] = {
    def branches(n: JsonNode): Seq[JsonNode] =
      Option(n.get("anyOf")).map(_.elements().asScala.toSeq)
        .getOrElse(Seq(n))
    val bs = branches(spec)
    val ref = spec.path("$ref").asText()
    if (ref.endsWith("#temporalOrNull"))
      Some(PropRule(path, Seq(TemporalPattern), "temporal"))
    else if (bs.exists(_.path("format").asText() == "email"))
      Some(PropRule(path, Seq(EmailPattern), "email"))
    else if (bs.exists(_.path("format").asText() == "uri"))
      Some(PropRule(path, Seq(UriPattern), "uri"))
    else {
      val pats = bs.flatMap(b => Option(b.get("pattern")).map(_.asText()))
      if (pats.nonEmpty) Some(PropRule(path, pats, "pattern")) else None
    }
  }

  /** Load one level's schema from a file on disk. */
  def load(path: String): LevelSchema =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** The engine's built-in profile schemas (classpath resources) —
    * the same constraints the validator has always enforced, now as
    * editable data. */
  def loadDefault(level: String): LevelSchema = {
    val res = s"/graft/schemas/$level.json"
    val in = getClass.getResourceAsStream(res)
    require(in != null, s"missing built-in schema resource $res")
    try parse(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}
