package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.CatalogReader

/** Catalog metadata validation (SURVEY §2.9 catalog-level; reference
  * validate_catalog against the config/schemas JSON-Schemas + harvest
  * filtering).
  *
  * The schema-expressible rules — required keys, `pattern`s, `format`
  * email/uri, the temporal interval — are DRIVEN by draft-04 schema
  * files via [[SchemaRules]] (built-in resources under
  * `graft/schemas/`, overridable per call), mirroring the reference's
  * generic-validator design (`base.py:423-453`): editing a schema file
  * changes enforcement with no code change. Each parsed rule becomes a
  * violation query over the exploded views; the union of violations is
  * the error report (the reference's reporte-catalogo-errores), and
  * the harvest filter (P4) keeps datasets with zero violations.
  *
  * Relational checks a JSON Schema cannot express stay code: field-id
  * uniqueness across the catalog, field-title uniqueness per
  * distribution, dataset.theme referencing themeTaxonomy ids, and the
  * temporal start ≤ end ordering (attached to the schema's temporal
  * rule).
  */
object CatalogValidator {

  private def nonEmpty(c: Column): Column = c.isNotNull && length(c) > 0

  private def violation(df: DataFrame, level: String, idCol: String,
      cond: Column, rule: String): DataFrame =
    df.filter(cond).select(lit(level).as("level"),
      col(idCol).cast("string").as("identifier"), lit(rule).as("rule"))

  private def missing(df: DataFrame, level: String, idCol: String,
      required: Seq[String]): Seq[DataFrame] =
    required.filter(df.columns.contains).map(c =>
      df.filter(col(c).isNull)
        .select(lit(level).as("level"), col(idCol).cast("string")
          .as("identifier"), lit(s"missing required: $c").as("rule"))) ++
      required.filterNot(df.columns.contains).map(c =>
        df.limit(1).select(lit(level).as("level"),
          col(idCol).cast("string").as("identifier"),
          lit(s"missing required: $c").as("rule")))

  /** Does the (possibly nested) column path resolve in this frame's
    * schema? Schema files may constrain fields a given catalog never
    * materializes. */
  private def hasPath(df: DataFrame, path: Seq[String]): Boolean = {
    import org.apache.spark.sql.types.{DataType, StructType}
    def go(dt: DataType, p: Seq[String]): Boolean = (dt, p) match {
      case (_, Nil) => true
      case (s: StructType, h +: t) =>
        s.find(_.name == h).exists(f => go(f.dataType, t))
      case _ => false
    }
    go(df.schema, path)
  }

  /** Violation rows `(level, identifier, rule)` for the whole catalog
    * document. `schemaDir` points at a directory of
    * `{catalog,dataset,distribution,field,theme}.json` draft-04 files
    * to validate against — levels missing from the directory fall back
    * to the built-in profile schemas (partial overrides compose);
    * None uses the built-ins throughout. */
  def violations(spark: SparkSession, catalog: DataFrame,
      schemaDir: Option[String] = None): DataFrame = {
    val datasets = CatalogReader.datasets(catalog)
    val distributions = CatalogReader.distributions(catalog)
    val fields = CatalogReader.fields(catalog)
    // raw (unprefixed) field/theme object views: schema property paths
    // are the reference's own member names (field.json `id`/`title`/…,
    // theme.json `id`/`label`/…), so the schema-driven rules evaluate
    // against the object shape, not the engine's prefixed report view
    val fieldObjs = distributions
      .select(explode(col("field")).as("f")).select(col("f.*"))
    val themeObjs = catalog
      .select(explode_outer(col("themeTaxonomy")).as("th"))
      .select(col("th.*"))

    def schema(level: String): SchemaRules.LevelSchema = schemaDir match {
      case Some(d) if java.nio.file.Files
          .exists(java.nio.file.Paths.get(d, s"$level.json")) =>
        SchemaRules.load(s"$d/$level.json")
      case _ => SchemaRules.loadDefault(level)
    }

    val levels = Seq(
      ("catalog", catalog, "catalog_id"),
      ("dataset", datasets, "dataset_id"),
      ("distribution", distributions, "distribution_id"),
      ("field", fieldObjs, "id"),
      ("theme", themeObjs, "id"))

    // schema-driven: required keys + per-property pattern/format rules
    val schemaChecks = levels.flatMap { case (level, df, idCol) =>
      val ls = schema(level)
      val req = missing(df, level, idCol, ls.required)
      val props = ls.rules.filter(r => hasPath(df, r.path)).flatMap { r =>
        val c = col(r.dotted)
        // draft-04 anyOf: valid if ANY alternative matches, so the
        // violation is failing them ALL (null/empty is optionality,
        // guarded by nonEmpty)
        val failsAll = r.patterns.map(p => !c.rlike(p)).reduce(_ && _)
        val base = violation(df, level, idCol, nonEmpty(c) && failsAll,
          r.rule)
        if (r.kind == "temporal") {
          // interval semantics the pattern can't express: start <= end
          val tStart = to_date(regexp_extract(c,
            "^(\\d{4}-\\d{2}-\\d{2})", 1))
          val tEnd = to_date(regexp_extract(c,
            "/(\\d{4}-\\d{2}-\\d{2})", 1))
          Seq(base, violation(df, level, idCol,
            nonEmpty(c) && c.rlike(r.patterns.head) && tStart > tEnd,
            "temporal interval start after end"))
        } else Seq(base)
      }
      req ++ props
    }

    // relational checks beyond JSON-Schema: field ids unique within
    // the catalog; titles unique per distribution
    val dupIds = fields.filter(col("field_id").isNotNull)
      .groupBy(col("catalog_id"), col("field_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(lit("field").as("level"), col("field_id").as("identifier"),
        lit("duplicate field id in catalog").as("rule"))
    val dupTitles = fields.filter(col("field_title").isNotNull)
      .groupBy(col("distribution_id"), col("field_title"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(lit("field").as("level"),
        concat_ws(":", col("distribution_id"), col("field_title"))
          .as("identifier"),
        lit("duplicate field title in distribution").as("rule"))

    // dataset.theme values must reference themeTaxonomy ids
    // (theme.json + pydatajson's taxonomy check)
    val themeIds = catalog.select(col("catalog_id"),
        explode_outer(col("themeTaxonomy")).as("th"))
      .select(col("catalog_id"), col("th.id").as("theme_ref"))
    val themeRefs = datasets
      .select(col("catalog_id"), col("dataset_id"),
        explode(col("theme")).as("theme_ref"))
    val badThemeRefs = themeRefs
      .join(themeIds, Seq("catalog_id", "theme_ref"), "left_anti")
      .select(lit("dataset").as("level"),
        col("dataset_id").cast("string").as("identifier"),
        concat(lit("theme not in themeTaxonomy: "), col("theme_ref"))
          .as("rule"))

    (schemaChecks ++ Seq(dupIds, dupTitles, badThemeRefs))
      .reduce(_ union _)
  }

  /** P4 — harvest filter: the datasets view restricted to datasets with
    * zero violations (reference generate_datasets_report harvest='valid'). */
  def harvestableDatasets(spark: SparkSession, catalog: DataFrame): DataFrame = {
    val datasets = CatalogReader.datasets(catalog)
    val bad = violations(spark, catalog)
      .filter(col("level") === "dataset")
      .select(col("identifier").as("dataset_id")).distinct()
    datasets.join(bad, Seq("dataset_id"), "left_anti")
  }
}
