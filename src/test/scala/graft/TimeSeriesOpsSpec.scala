package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.model.Frequency
import graft.operators.{Reports, TimeSeriesOps}

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("monotonicViolations finds duplicates (T4)") {
    val s = Seq(
      ("a", d("2020-01-01"), 1.0), ("a", d("2020-02-01"), 2.0),
      ("a", d("2020-02-01"), 3.0), // dup
      ("b", d("2020-01-01"), 1.0), ("b", d("2020-04-01"), 2.0))
      .toDF("serie_id", "indice_tiempo", "valor")
    val v = TimeSeriesOps.monotonicViolations(s).collect()
    assert(v.length == 1 && v.head.getAs[String]("serie_id") == "a")
  }

  test("frequencyGaps detects missing periods incl. semester (T3)") {
    val s = Seq(
      ("a", d("2020-01-01")), ("a", d("2020-07-01")), ("a", d("2021-07-01")),
      ("b", d("2020-01-01")), ("b", d("2020-07-01")))
      .toDF("serie_id", "indice_tiempo").withColumn("valor", lit(1.0))
    val gaps = TimeSeriesOps.frequencyGaps(s, Frequency.Semester).collect()
    assert(gaps.length == 1)
    assert(gaps.head.getAs[String]("serie_id") == "a")
    assert(gaps.head.getAs[Double]("step_periods") == 2.0)
  }

  test("validationSummary verdicts (§2.9 battery)") {
    val s = Seq(
      ("ok", d("2020-01-01"), Some(1.0)), ("ok", d("2020-02-01"), Some(2.0)),
      ("dup", d("2020-01-01"), Some(1.0)), ("dup", d("2020-01-01"), Some(2.0)),
      ("holey", d("2020-01-01"), None), ("holey", d("2020-02-01"), None),
      ("holey", d("2020-03-01"), Some(1.0)))
      .toDF("serie_id", "indice_tiempo", "valor")
    val m = TimeSeriesOps.validationSummary(s).collect()
      .map(r => r.getAs[String]("serie_id") -> r).toMap
    assert(m("ok").getAs[Boolean]("is_valid"))
    assert(!m("dup").getAs[Boolean]("is_distinct"))
    assert(!m("dup").getAs[Boolean]("is_valid"))
    assert(m("holey").getAs[Double]("missing_ratio") > 0.5)
    assert(!m("holey").getAs[Boolean]("is_valid"))
  }

  test("completeCalendar fills gaps at declared frequency") {
    val s = Seq(("a", d("2020-01-01"), 1.0), ("a", d("2020-04-01"), 2.0))
      .toDF("serie_id", "indice_tiempo", "valor")
    val cal = TimeSeriesOps.completeCalendar(s, Frequency.Monthly)
    assert(cal.count() == 4)
    assert(cal.filter(col("valor").isNull).count() == 2)
  }

  test("indicators + success percentage (A1-A3) incl. zero division") {
    val ds = Seq("OK", "OK", "ERROR").toDF("dataset_status")
    val dist = Seq("OK", "ERROR", "WARNING", "OK").toDF("distribution_status")
    val ind = Reports.indicators(ds, dist).head()
    assert(ind.getAs[Long]("datasets") == 3)
    assert(ind.getAs[Long]("datasets_ok") == 2)
    assert(ind.getAs[Long]("distributions_error") == 1)
    assert(ind.getAs[Double]("distributions_percentage") == 50.0)
    val empty = spark.emptyDataFrame
      .withColumn("distribution_status", lit("OK"))
      .filter(lit(false))
    val zero = Reports.indicators(
      Seq.empty[String].toDF("dataset_status"), empty).head()
    assert(zero.getAs[Double]("distributions_percentage") == 0.0)
  }

  test("statusRank orders ERROR < WARNING < OK (O1)") {
    val sorted = Reports.sortByStatus(
      Seq("OK", "ERROR", "WARNING").toDF("distribution_status"))
      .collect().map(_.getString(0))
    assert(sorted.toSeq == Seq("ERROR", "WARNING", "OK"))
  }
}
