package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Minimal user-facing entry: run the reference-parity ETL on a catalog.
  *
  *   sbt "runMain graft.Demo <catalog.json> <outputDir>"
  *
  * Prints the distribution report and the indicator summary row.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val Array(catalogPath, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(java.nio.file.Paths.get(outDir))
    val result = Pipeline.run(spark, catalogPath, "democat", outDir)
    result.report.show(100, truncate = false)
    result.indicators.show(truncate = false)
    spark.stop()
  }
}
