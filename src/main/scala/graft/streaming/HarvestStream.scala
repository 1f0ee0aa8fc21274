package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Continuous harvest: the reference's batch ETL run as a long-lived
  * Structured Streaming service (engine extension — the reference
  * re-runs from cron, `main.py`; here newly-landed catalogs process
  * incrementally with exactly the same batch core).
  *
  * Design: the STREAM is control-plane only — a manifest directory
  * where each JSON line names a catalog (`{"path": ..., "catalog_id":
  * ...}`). `foreachBatch` collects the handful of new manifest rows
  * (metadata, like every other driver-side collect in the engine) and
  * runs the existing `Pipeline.run` per catalog — so the data plane
  * keeps the batched one-scrape-per-catalog shape, fault isolation,
  * reports, and sinks of the batch ETL, and a catalog failure degrades
  * to that catalog's ERROR rows without stopping the stream. File
  * sources track processed files in the checkpoint, so each manifest
  * drop processes exactly once across restarts.
  */
object HarvestStream {

  val manifestSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("catalog_id", StringType)))

  /** Start harvesting: every manifest row that lands in `manifestDir`
    * triggers a full pipeline run for its catalog into `outputDir`.
    * `grids` / `stagingDir` / `replace` pass through to
    * [[graft.Pipeline.run]]. Results accumulate per catalog under the
    * same output contract as the batch CLI. */
  def start(spark: SparkSession, manifestDir: String, outputDir: String,
      grids: Map[String, DataFrame] = Map.empty,
      stagingDir: Option[String] = None,
      replace: Boolean = true,
      queryName: String = "graft-harvest"): StreamingQuery =
    spark.readStream
      .schema(manifestSchema)
      .json(manifestDir)
      .writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val catalogs = batch.select("path", "catalog_id")
          .distinct().collect()
        catalogs.foreach { r =>
          val (path, id) = (r.getString(0), r.getString(1))
          try graft.Pipeline.run(spark, path, id, outputDir,
            grids = grids, stagingDir = stagingDir, replace = replace)
          catch {
            case scala.util.control.NonFatal(e) =>
              // a broken catalog must not kill the service — mirror the
              // batch CLI's per-catalog try/except (reference main.py)
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"harvest of catalog $id failed: ${e.toString.take(300)}")
          }
        }
        ()
      }
      .start()
}
