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
}
