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
