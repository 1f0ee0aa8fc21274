package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Native expressions + SQL registration. `withExtensions` only binds
  * to sessions built after it — under a shared test JVM getOrCreate
  * reuses the first session, so the suite installs via
  * GraftExtensions.register (same builders the extension injects). */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("graft_cell_row / graft_cell_col in plain SQL, codegen'd") {
    val r = spark.sql(
      """SELECT graft_cell_row('A8') r1, graft_cell_col('A8') c1,
        |  graft_cell_row('BA37') r2, graft_cell_col('BA37') c2,
        |  graft_cell_row('bogus') rb, graft_cell_col('8A') cb""".stripMargin)
      .head()
    assert(r.getInt(0) == 8 && r.getInt(1) == 1)
    assert(r.getInt(2) == 37 && r.getInt(3) == 53)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("native expressions run over a column inside codegen") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"${('A' + i % 26).toChar}${i % 90 + 1}")
      .toDF("coord")
    df.createOrReplaceTempView("coords")
    val out = spark.sql(
      """SELECT sum(graft_cell_row(coord)) rs, sum(graft_cell_col(coord)) cs
        |FROM coords""".stripMargin).head()
    assert(out.getLong(0) > 0 && out.getLong(1) > 0)
  }

  test("graft_normalize_value round-trips the F6 normalization in SQL") {
    import graft.functions.GF
    // every missing token nulls; numerics parse; junk nulls
    val toks = GF.MissingTokens.map(t => t.replace("'", "''"))
    val cases = toks.map(t => s"graft_normalize_value('$t')") ++
      Seq("graft_normalize_value(' 42.5 ')",
        "graft_normalize_value('1e3')",
        "graft_normalize_value('abc')")
    val r = spark.sql(s"SELECT ${cases.mkString(", ")}").head()
    toks.indices.foreach(i => assert(r.isNullAt(i), s"token '${toks(i)}'"))
    assert(r.getDouble(toks.size) == 42.5)
    assert(r.getDouble(toks.size + 1) == 1000.0)
    assert(r.isNullAt(toks.size + 2))
  }

  test("graft_shingles matches Dedup.shingleRows per doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "The quick  brown fox, jumps over the lazy dog"),
      (2L, "tiny"), (3L, "a b c d e")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("shdocs")
    val viaSql = spark.sql(
      "SELECT doc_id, explode(graft_shingles(text, 3)) AS shingle " +
        "FROM shdocs")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaOp = graft.operators.Dedup.shingleRows(docs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaSql == viaOp)
    // n must be a literal
    val e = intercept[Exception](
      spark.sql("SELECT graft_shingles(text, doc_id) FROM shdocs")
        .collect())
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("graft_simhash matches the Dedup.simhash operator bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
      .documents.select("doc_id", "text").limit(50)
    docs.createOrReplaceTempView("simdocs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash(text) AS simhash FROM simdocs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaOp = graft.operators.Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaOp, "SQL simhash diverged from the operator")
    assert(viaSql.values.exists(_ != 0L))
  }

  test("graft_lsh_bucket matches Dedup.lshBuckets for every band") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
      .documents.select("doc_id", "text").limit(30)
    docs.createOrReplaceTempView("lshdocs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_lsh_bucket(text, 0) AS b0,
        |  graft_lsh_bucket(text, 1) AS b1,
        |  graft_lsh_bucket(text, 2) AS b2,
        |  graft_lsh_bucket(text, 3) AS b3
        |FROM lshdocs""".stripMargin)
      .collect().flatMap(r => (0 until 4).map(b =>
        (r.getLong(0), b) -> r.getString(1 + b)))
      .toMap
    val viaOp = graft.operators.Dedup.lshBuckets(
        graft.operators.Dedup.minhashSignature(docs, "text", "doc_id",
          k = 8, shingleN = 3), "doc_id", k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    assert(viaSql == viaOp, "SQL LSH bucket diverged from the operator")
  }

  test("graft_vec_dot/norm match the HOF fold bit-for-bit, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // pseudo-random float vectors: the native loop must reproduce the
    // zip_with+aggregate sequential fold EXACTLY (no reassociation)
    val vecs = (1 to 200).map { i =>
      (i.toLong, (0 until 64).map(d =>
        (((i * 31 + d * 7) % 97) - 48) / 13.0f).toArray)
    }.toDF("id", "v")
    val paired = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.id") < col("b.id")).limit(500)
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val diff = paired.select(
      graft.operators.Similarity.dot(col("va"), col("vb")).as("nat"),
      graft.operators.Similarity.dotHof(col("va"), col("vb")).as("hof"),
      graft.operators.Similarity.norm(col("va")).as("natn"),
      graft.operators.Similarity.normHof(col("va")).as("hofn"))
      .filter(col("nat") =!= col("hof") || col("natn") =!= col("hofn"))
      .count()
    assert(diff == 0, "native fold diverged from the HOF fold")

    // null semantics: null array, length mismatch, null element
    val r = spark.sql(
      """SELECT graft_vec_dot(CAST(null AS ARRAY<DOUBLE>), array(1.0d)) a,
        |  graft_vec_dot(array(1.0d), array(1.0d, 2.0d)) b,
        |  graft_vec_dot(array(1.0d, CAST(null AS DOUBLE)), array(1.0d, 2.0d)) c,
        |  graft_vec_norm(array(3.0d, 4.0d)) n""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 5.0)
  }
}
