package graft.sinks

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K2 — rewritten catalog `data.json` sink, plus the P7 scraping-key
  * strip (SURVEY §2.2 K2, §2.3 P7; reference base.py:494-498,662-671).
  *
  * The catalog travels as ONE nested row; stripping operates on the
  * nested arrays with `transform` + `dropFields` (no explode/re-nest
  * round trip), and serialization uses the schema-ordered `toJSON`.
  */
object CatalogJson {

  /** P7 — remove scraping-only metadata before publishing:
    * distribution.{scrapingFileURL, scrapingFileSheet} and
    * field.{scrapingIdentifierCell, scrapingDataStartCell}. */
  def stripScrapingKeys(catalog: DataFrame): DataFrame = {
    val strippedDistribution: Column => Column = dist =>
      dist.withField("field",
        transform(dist.getField("field"),
          f => f.dropFields("scrapingIdentifierCell", "scrapingDataStartCell")))
        .dropFields("scrapingFileURL", "scrapingFileSheet")
    catalog.withColumn("dataset",
      transform(col("dataset"), ds =>
        ds.withField("distribution",
          transform(ds.getField("distribution"), strippedDistribution))))
  }

  /** F7 applied inside the nested doc: rewrite each distribution's
    * downloadURL from a (distribution_id -> url) map. */
  def withDownloadUrls(catalog: DataFrame,
      urls: Map[String, String]): DataFrame = {
    if (urls.isEmpty) return catalog
    val urlMap = map(urls.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }.toSeq: _*)
    catalog.withColumn("dataset",
      transform(col("dataset"), ds =>
        ds.withField("distribution",
          transform(ds.getField("distribution"), dist =>
            dist.withField("downloadURL",
              coalesce(element_at(urlMap, dist.getField("identifier")),
                dist.getField("downloadURL")))))))
  }

  /** Write the (single-row) catalog DataFrame as data.json. Null fields
    * are omitted, matching the reference's sparse documents. */
  def write(catalog: DataFrame, target: String): Path = {
    val json = catalog.toJSON.collect()
    require(json.length == 1, s"expected 1 catalog row, got ${json.length}")
    val p = Paths.get(target)
    Files.createDirectories(p.getParent)
    Files.writeString(p, json.head)
    p
  }
}
