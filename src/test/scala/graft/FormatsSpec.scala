package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Interchange-format coverage beyond parquet: ORC (Spark-native
  * columnar alternative), JSON lines and CSV roundtrips of the corpus
  * tables, with the scan-side properties (predicate pushdown into the
  * ORC reader) asserted so the format keeps its columnar advantages. */
class FormatsSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")

  test("orc roundtrip preserves schema and rows; filters push into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    docs.write.mode("overwrite").orc(s"$dir/documents.orc")
    val back = spark.read.orc(s"$dir/documents.orc")
    assert(back.schema == docs.schema, s"orc schema drift: ${back.schema}")
    assert(back.count() == docs.count())
    val filtered = back.filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"))
    val p = filtered.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)"),
      s"ORC predicate pushdown missing:\n$p")
    // column pruning reaches the ORC reader too
    assert(p.contains("ReadSchema") && !p.contains("n_chars"),
      s"ORC column pruning failed:\n$p")
    val viaOrc = filtered.count()
    val viaParquet = docs.filter(col("lang") === "en").count()
    assert(viaOrc == viaParquet)
  }

  test("json-lines roundtrip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    docs.write.mode("overwrite").json(s"$dir/documents.json")
    // JSON is schemaless on disk: read back with the explicit schema
    // (the S3 catalog-scan discipline — never infer in production)
    val back = spark.read.schema(docs.schema).json(s"$dir/documents.json")
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = back.orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b), "json roundtrip value drift")
  }

  test("csv roundtrip with header + explicit schema preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    docs.write.mode("overwrite").option("header", "true")
      .csv(s"$dir/documents.csv")
    val back = spark.read.option("header", "true").schema(docs.schema)
      .csv(s"$dir/documents.csv")
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = back.orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b), "csv roundtrip value drift")
  }
}
