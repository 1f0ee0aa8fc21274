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

  test("z-order layout prunes files on BOTH columns; plain sort only on one") {
    import spark.implicits._
    import graft.operators.Layout
    // uniform 256x256 grid of (a, b) points
    val grid = spark.range(256 * 256)
      .select((col("id") / 256).cast("long").as("a"),
        pmod(col("id"), lit(256)).cast("long").as("b"))
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString + "/z"
    Layout.zOrderWrite(grid, "a", "b", zDir, nFiles, bits = 8)

    val aDir = java.nio.file.Files.createTempDirectory("graft-a").toString + "/a"
    grid.repartitionByRange(nFiles, col("a"))
      .sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(aDir)

    // same rows either way
    assert(spark.read.parquet(zDir).count() == 256L * 256L)

    // a narrow band on each dimension (1/16 of the domain)
    val zA = Layout.pruneFraction(spark, zDir, "a", 64, 79)
    val zB = Layout.pruneFraction(spark, zDir, "b", 64, 79)
    val sA = Layout.pruneFraction(spark, aDir, "a", 64, 79)
    val sB = Layout.pruneFraction(spark, aDir, "b", 64, 79)
    // plain a-sort: perfect on a, useless on b (every file spans all b)
    assert(sA <= 0.25, s"a-sorted layout should prune on a (got $sA)")
    assert(sB >= 0.99, s"a-sorted layout can't prune on b (got $sB)")
    // aligned z-order over ~16 files = exact 64x64 tiles: a 16-wide
    // band on either dimension hits one tile row/column (4 tiles; the
    // range partitioner may materialize 15-16 files, so allow 4/15)
    assert(zA <= 0.28, s"z-order failed to prune on a (got $zA)")
    assert(zB <= 0.28, s"z-order failed to prune on b (got $zB)")
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
