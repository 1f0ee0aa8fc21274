package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (engine extension — the reference is
  * pure batch, SURVEY §2.11; this is the scale path for continuously
  * arriving series/event data).
  *
  * The same transforms used in batch (windowed aggregation, per-key
  * sessionization) run incrementally: `readStream` over the landing
  * directory, watermarked event-time windows, `flatMapGroupsWithState`
  * for custom session state. Tested by streaming a batch of parquet
  * through a memory sink (see StreamingSpec).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Watermarked tumbling-window aggregation per event type: the
    * incremental form of q07_pivot_daily's groupBy. */
  def windowedCounts(events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup: first occurrence of each content digest
    * wins, duplicates within the watermark horizon are dropped —
    * `dropDuplicatesWithinWatermark` keyed by the digest keeps ONLY the
    * 16-byte key in the state store (never the payload) and, unlike
    * plain `dropDuplicates("digest")` (which never evicts state when
    * the event-time column is not part of the key), expires each key
    * once the watermark passes its first-seen event time — so state
    * stays bounded on a crawler firehose. The incremental form of
    * Dedup.exactDedup. */
  def streamingDedup(docs: DataFrame, textCol: String,
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest",
        md5(graft.operators.Dedup.normalizeText(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(nEvents: Long, total: Double,
      lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long,
      total_value: Double)

  /** Per-user running session state via mapGroupsWithState — the
    * engine's custom-state extension point. Each micro-batch emits the
    * updated per-user aggregate (Update output mode); state survives
    * across batches. Event-time session *closing* would add an
    * EventTimeTimeout on top of the same state shape. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          var n = prev.nEvents
          var tot = prev.total
          var last = prev.lastTs
          rows.foreach { e =>
            n += 1; tot += e.value; last = math.max(last, e.ts.getTime)
          }
          state.update(SessionState(n, tot, last))
          SessionOut(userId, n, tot)
      }.toDF()
  }
}
