package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streams a batch of the events table through the streaming operators
  * via a memory sink (no real-time dependency). */
class StreamingSpec extends SparkSpec {

  test("windowed counts over a streamed batch match the batch plan") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val batch = Tables(spark, sf()).events
      .select("event_id", "ts", "user_id", "event_type", "value")
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(EventStream.eventSchema)
      .parquet(dir)
    val q = EventStream.windowedCounts(stream, "6 hours", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("windowed")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()

    // append mode only emits *closed* windows (watermark passed); the
    // batch equivalent restricted to those windows must agree.
    val streamed = spark.table("windowed")
    val maxEmitted = streamed.agg(max(col("window_start"))).head().get(0)
    assert(streamed.count() > 0)
    val batchEquivalent = EventStream.windowedCounts(batch, "6 hours", "1 hour")
    val bMap = batchEquivalent.collect()
      .map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    streamed.collect().foreach { r =>
      val key = (r.get(0), r.getString(1))
      assert(bMap(key) == ((r.getLong(2), r.getDouble(3))),
        s"window $key disagrees with batch")
    }
    assert(maxEmitted != null)
  }

  test("sessionize keeps per-user custom state across a streamed batch") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    val input = Tables(spark, sf()).events
      .filter(col("user_id") < 3)
      .select("event_id", "ts", "user_id", "event_type", "value")
    input.write.mode("overwrite").parquet(dir)
    val expected = input.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("tot"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val stream = spark.readStream
      .schema(EventStream.eventSchema).parquet(dir)
    val q = EventStream.sessionize(spark, stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("sessions")
      .start()
    try q.processAllAvailable() finally q.stop()

    val sessions = spark.table("sessions").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))).toMap
    assert(sessions.keySet == Set(0L, 1L, 2L))
    sessions.foreach { case (u, (n, tot)) =>
      assert(n == expected(u)._1)
      assert(math.abs(tot - expected(u)._2) < 1e-6)
    }
  }

  test("event-time session windows match batch sessionization once sealed") {
    // the incremental form of q24: sessions closed by gap or watermark
    // timeout must equal the batch window computation row for row
    val dir = Files.createTempDirectory("graft-stream5").toString
    import spark.implicits._
    val input = Tables(spark, sf()).events
      .filter(col("user_id") < 5)
      .select("event_id", "ts", "user_id", "event_type", "value")
    input.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(EventStream.eventSchema).parquet(dir)
    val q = EventStream.sessionWindows(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sesswin")
      .start()
    try {
      q.processAllAvailable()
      // a far-future flush event advances the watermark past every open
      // session's timeout, sealing them all
      val far = input.agg(max(col("ts"))).head()
        .getTimestamp(0).getTime + 86400000L
      Seq((999999L, new java.sql.Timestamp(far), 999999L, "view", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    def usOf(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val streamed = spark.table("sesswin")
      .filter(col("user_id") < 5).collect()
      .map(r => (r.getAs[Long]("user_id"),
        usOf(r.getAs[java.sql.Timestamp]("session_start")),
        usOf(r.getAs[java.sql.Timestamp]("session_end")),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val batch = SparkEntry.queries("q24_sessionize")(spark, sf())
      .filter(col("user_id") < 5).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSet
    assert(streamed == batch,
      s"stream-only: ${streamed.diff(batch)}; batch-only: ${batch.diff(streamed)}")
  }

  test("session windows are invariant to micro-batch splits") {
    // the same event sequence delivered as ONE batch vs THREE ordered
    // batches (one split mid-session) must seal identical sessions
    import spark.implicits._
    val events = Seq(
      // user 1: two sessions (70 min silence between rows 2 and 3)
      (10L, "2024-01-01 10:00:00", 1L, 1.0),
      (11L, "2024-01-01 10:10:00", 1L, 2.0),
      (12L, "2024-01-01 11:20:00", 1L, 4.0),
      (13L, "2024-01-01 11:40:00", 1L, 8.0),
      // user 2: one session spanning the chunk boundary
      (20L, "2024-01-01 10:05:00", 2L, 1.5),
      (21L, "2024-01-01 10:30:00", 2L, 2.5),
      (22L, "2024-01-01 10:55:00", 2L, 3.5),
      // user 3: single-event session
      (30L, "2024-01-01 11:00:00", 3L, 9.0))
    val flush = Seq((99L, "2024-01-03 00:00:00", 99L, 0.0))

    def run(name: String,
        chunks: Seq[Seq[(Long, String, Long, Double)]]): Set[(Long, Long, Long, Double)] = {
      val dir = Files.createTempDirectory(s"graft-split-$name").toString
      def write(c: Seq[(Long, String, Long, Double)]): Unit =
        c.toDF("event_id", "s", "user_id", "value")
          .select(col("event_id"), to_timestamp(col("s")).as("ts"),
            col("user_id"), lit("e").as("event_type"), col("value"))
          .write.mode("append").parquet(dir)
      write(chunks.head)
      val q = EventStream.sessionWindows(spark, spark.readStream
          .schema(EventStream.eventSchema).parquet(dir))
        .writeStream.outputMode("append")
        .format("memory").queryName(s"split_$name").start()
      try {
        q.processAllAvailable()
        (chunks.tail :+ flush).foreach { c =>
          write(c); q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(s"split_$name").filter(col("user_id") < 90).collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    }

    val oneBatch = run("one", Seq(events))
    val threeBatches = run("three", Seq(
      events.take(2) ++ events.slice(4, 6), // u1 s1, u2 partial
      events.slice(2, 3) ++ events.slice(6, 7), // u1 s2 starts, u2 ends
      events.slice(3, 4) ++ events.slice(7, 8))) // u1 s2 ends, u3
    assert(oneBatch == threeBatches,
      s"one-batch: $oneBatch\nthree-batch: $threeBatches")
    // and both equal the hand-computed truth
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime
    assert(oneBatch == Set(
      (1L, ms("2024-01-01 10:00:00"), 2L, 3.0),
      (1L, ms("2024-01-01 11:20:00"), 2L, 12.0),
      (2L, ms("2024-01-01 10:05:00"), 3L, 7.5),
      (3L, ms("2024-01-01 11:00:00"), 1L, 9.0)), oneBatch)
  }

  test("session windows refold out-of-order events across micro-batches") {
    // the state buffers unsealed events and re-folds per invocation, so
    // a late event (above the watermark) arriving in a LATER micro-batch
    // can bridge two provisional sessions (u1) or open a distinct
    // EARLIER session (u2) instead of being absorbed into the open one —
    // the two failure modes of fold-summary state.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ooo").toString
    def write(rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.toDF("event_id", "s", "user_id", "value")
        .select(col("event_id"), to_timestamp(col("s")).as("ts"),
          col("user_id"), lit("e").as("event_type"), col("value"))
        .write.mode("append").parquet(dir)
    // batch 1: u1 has two provisional sessions (50 min apart); u2 one
    write(Seq(
      (10L, "2024-01-01 10:00:00", 1L, 1.0),
      (12L, "2024-01-01 10:50:00", 1L, 4.0),
      (20L, "2024-01-01 10:45:00", 2L, 9.0)))
    val q = EventStream.sessionWindows(spark, spark.readStream
        .schema(EventStream.eventSchema).parquet(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("ooo").start()
    try {
      q.processAllAvailable() // watermark now 09:50 — nothing sealed
      // batch 2, both above the watermark: 10:20 bridges u1's two
      // provisional sessions into one; 09:55 is a separate EARLIER
      // session for u2 (50 min before 10:45)
      write(Seq(
        (11L, "2024-01-01 10:20:00", 1L, 2.0),
        (21L, "2024-01-01 09:55:00", 2L, 3.0)))
      q.processAllAvailable()
      write(Seq((99L, "2024-01-03 00:00:00", 99L, 0.0))) // flush-seal
      q.processAllAvailable()
    } finally q.stop()
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime
    val got = spark.table("ooo").filter(col("user_id") < 90).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[java.sql.Timestamp]("session_end").getTime,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(got == Set(
      (1L, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:50:00"), 3L, 7.0),
      (2L, ms("2024-01-01 09:55:00"), ms("2024-01-01 09:55:00"), 1L, 3.0),
      (2L, ms("2024-01-01 10:45:00"), ms("2024-01-01 10:45:00"), 1L, 9.0)),
      got)
  }

  test("series guard accepts month-end-anchored series like batch months_between") {
    // Jan 31 -> Feb 28 -> Mar 31 is EXACTLY monthly under Spark's
    // months_between (last-day-to-last-day = whole month); the guard
    // must agree with batch frequencyGaps — zero violations — and both
    // must still flag a fractional step (Mar 31 -> Apr 15).
    import spark.implicits._
    val rows = Seq(
      ("me", "2019-01-31", 1.0), ("me", "2019-02-28", 2.0),
      ("me", "2019-03-31", 3.0), ("me", "2019-04-15", 4.0))
    val batchDf = rows.toDF("serie_id", "d", "valor")
      .select(col("serie_id"), to_date(col("d")).as("indice_tiempo"),
        col("valor"))
    val batchGaps = graft.operators.TimeSeriesOps
      .frequencyGaps(batchDf, graft.model.Frequency.Monthly)
      .select("indice_tiempo").collect().map(_.getDate(0).toString).toSet
    assert(batchGaps == Set("2019-04-15"), batchGaps)

    val dir = Files.createTempDirectory("graft-guard-me").toString
    batchDf.write.mode("overwrite").parquet(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("serie_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("indice_tiempo",
        org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("valor",
        org.apache.spark.sql.types.DoubleType)))
    val q = EventStream.seriesGuard(spark,
        spark.readStream.schema(schema).parquet(dir), freqMonths = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("guardme").start()
    try q.processAllAvailable() finally q.stop()
    val streamGaps = spark.table("guardme").collect()
      .map(r => (r.getDate(1).toString, r.getString(2))).toSet
    assert(streamGaps == Set(("2019-04-15", "gap")), streamGaps)
  }

  test("stream-stream interval join matches the batch join across batches") {
    // marks arriving in a LATER micro-batch (still above the watermark)
    // must pair with earlier events inside the lookback window — the
    // state-store side of the interval join — and the result must equal
    // the identical join run as one batch query
    import spark.implicits._
    val evDir = Files.createTempDirectory("graft-ssj-ev").toString
    val mkDir = Files.createTempDirectory("graft-ssj-mk").toString
    def ev(rows: Seq[(Long, String, Long, Double)], dir: String): Unit =
      rows.toDF("event_id", "s", "user_id", "value")
        .select(col("event_id"), to_timestamp(col("s")).as("ts"),
          col("user_id"), lit("e").as("event_type"), col("value"))
        .write.mode("append").parquet(dir)
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.0),
      (2L, "2024-01-01 10:20:00", 1L, 2.0),
      (3L, "2024-01-01 11:00:00", 2L, 3.0))
    val marks1 = Seq((90L, "2024-01-01 09:55:00", 1L, 0.5))
    val marks2 = Seq( // later batch, pairs with events already seen
      (91L, "2024-01-01 10:10:00", 1L, 0.7),
      (92L, "2024-01-01 10:59:00", 2L, 0.9))
    ev(events, evDir); ev(marks1, mkDir)

    val q = EventStream.enrichWithMarks(
        spark.readStream.schema(EventStream.eventSchema).parquet(evDir),
        spark.readStream.schema(EventStream.eventSchema).parquet(mkDir),
        lookbackSec = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    try {
      q.processAllAvailable()
      ev(marks2, mkDir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ssj").collect()
      .map(r => (r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("m_ts").getTime,
        r.getAs[Double]("mark_value"))).toSet
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime
    // event 1 pairs with 09:55 mark; event 2 with 09:55 AND 10:10;
    // event 3 with 10:59; nothing crosses users or exceeds 30 min back
    assert(got == Set(
      (1L, ms("2024-01-01 09:55:00"), 0.5),
      (2L, ms("2024-01-01 09:55:00"), 0.5),
      (2L, ms("2024-01-01 10:10:00"), 0.7),
      (3L, ms("2024-01-01 10:59:00"), 0.9)), got)

    // and the same operator over batch frames agrees row for row
    val evBatch = spark.read.parquet(evDir)
    val mkBatch = spark.read.parquet(mkDir)
    val batch = EventStream.enrichWithMarks(evBatch, mkBatch, 1800)
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("m_ts").getTime,
        r.getAs[Double]("mark_value"))).toSet
    assert(got == batch, s"stream/batch divergence: ${got.diff(batch)} ${batch.diff(got)}")
  }

  test("streaming dedup keeps first occurrence per content digest") {
    val dir = Files.createTempDirectory("graft-stream3").toString
    // duplicate texts across distinct event rows: event_type repeats
    val input = Tables(spark, sf()).events
      .filter(col("event_id") < 200)
      .select(col("event_id"), col("ts"),
        col("event_type").as("text"))
    input.write.mode("overwrite").parquet(dir)
    val nDistinct = input
      .select(graft.operators.Dedup.normalizeText(col("text"))).distinct()
      .count()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.streamingDedup(stream, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped")
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(spark.table("deduped").count() == nDistinct)
  }

  test("transformWithState: running per-language totals (state v2, RocksDB)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tws").toString
    def write(rows: Seq[(String, Long)]): Unit =
      rows.toDF("lang", "n_tokens").write.mode("append").parquet(dir)
    write(Seq(("en", 5L), ("en", 7L), ("zh", 3L)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType)))
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val provWas = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema).parquet(dir)
      val q = EventStream.runningLangStats(spark, stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("langstats").start()
      try {
        q.processAllAvailable()
        write(Seq(("en", 2L), ("fr", 11L)))
        q.processAllAvailable()
      } finally q.stop()
    } finally provWas match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }

    // the LAST emitted row per language carries the running total —
    // must equal the batch aggregation over everything written
    val finals = spark.table("langstats").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.maxBy(_._2)).toMap
    assert(finals("en") == (("en", 3L, 14L)), finals)
    assert(finals("zh") == (("zh", 1L, 3L)))
    assert(finals("fr") == (("fr", 1L, 11L)))
  }

  test("series guard flags duplicates, gaps, and disorder incrementally") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-guard").toString
    def write(rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("serie_id", "d", "valor")
        .select(col("serie_id"), to_date(col("d")).as("indice_tiempo"),
          col("valor"))
        .write.mode("append").parquet(dir)
    write(Seq(
      ("s1", "2020-01-01", 1.0), ("s1", "2020-02-01", 2.0),
      ("s1", "2020-02-01", 2.5), // duplicate
      ("s1", "2020-04-01", 4.0), // gap (March missing)
      ("s2", "2020-01-01", 9.0)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("serie_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("indice_tiempo",
        org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("valor",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.seriesGuard(spark, stream, freqMonths = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("guard").start()
    try {
      q.processAllAvailable()
      // next batch: a late March point (behind the accepted April) and
      // clean continuations for both series
      write(Seq(("s1", "2020-03-01", 3.0), // out_of_order
        ("s1", "2020-05-01", 5.0), ("s2", "2020-02-01", 10.0)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("guard").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getString(2)))
      .toSet
    assert(got == Set(
      ("s1", "2020-02-01", "duplicate"),
      ("s1", "2020-04-01", "gap"),
      ("s1", "2020-03-01", "out_of_order")), got)
  }

  test("harvest stream runs the batch ETL per landed catalog and survives failures") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-harvest")
    val manifestDir = Files.createDirectory(root.resolve("manifest")).toString
    val out = root.resolve("out").toString

    def writeCatalog(id: String): String = {
      val csv = root.resolve(s"src_$id.csv")
      Files.writeString(csv,
        "indice_tiempo,v\n2020-01-01,1\n2020-02-01,2\n")
      val cat = root.resolve(s"cat_$id.json")
      Files.writeString(cat,
        s"""{"identifier":"$id","title":"t","description":"d",
           |"publisher":{"name":"p"},"superThemeTaxonomy":"http://x",
           |"dataset":[{"identifier":"1","title":"ds","description":"d",
           |"publisher":{"name":"p"},"superTheme":["A"],
           |"accrualPeriodicity":"R/P1M","issued":"2020-01-01",
           |"distribution":[{"identifier":"1.1","title":"t",
           |"issued":"2020-01-01","fileName":"out.csv",
           |"downloadURL":"$csv","field":[
           |{"title":"indice_tiempo","type":"date",
           | "specialType":"time_index","specialTypeDetail":"R/P1M"},
           |{"id":"v","title":"v","type":"number"}]}]}]}"""
          .stripMargin.replace("\n", " "))
      cat.toString
    }
    def drop(rows: (String, String)*): Unit =
      rows.toSeq.toDF("path", "catalog_id").write.mode("append")
        .json(manifestDir)

    val q = graft.streaming.HarvestStream.start(spark, manifestDir, out)
    try {
      drop(writeCatalog("hv1") -> "hv1")
      q.processAllAvailable()
      assert(Files.exists(java.nio.file.Paths.get(out,
        "catalog/hv1/dataset/1/distribution/1.1/download/out.csv")))

      // second batch: one broken catalog (missing file) + one good one —
      // the guard logs the failure, the stream and the good catalog live
      drop(("/nonexistent/cat.json", "broken"), (writeCatalog("hv2"), "hv2"))
      q.processAllAvailable()
      assert(Files.exists(java.nio.file.Paths.get(out,
        "catalog/hv2/dataset/1/distribution/1.1/download/out.csv")))
      assert(q.isActive)
    } finally q.stop()
  }

  test("streaming curation matches the batch funnel and re-admits after TTL") {
    import spark.implicits._
    val goodText = "the quick brown fox jumps over the lazy dog and then " +
      "the fox runs back to the forest where all of the other animals wait"
    val junkText = (1 to 25).map(i => s"x$i$$%&").mkString(" ")
    val docs = Seq(
      (1L, "2024-01-01 10:00:00", goodText), // kept
      (2L, "2024-01-01 10:01:00", goodText), // duplicate of 1
      (3L, "2024-01-01 10:02:00", "too short"), // too_short
      (4L, "2024-01-01 10:03:00", junkText)) // low_quality
    val dir = Files.createTempDirectory("graft-stream6").toString
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "s", "text")
        .select(col("doc_id"), to_timestamp(col("s")).as("ts"), col("text"))
        .write.mode("append").parquet(dir)
    write(docs)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.curateStream(spark, stream, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    try {
      q.processAllAvailable()
      // push the watermark past every digest's 1 h TTL, then resend the
      // good text: its state was evicted, so it is judged afresh
      write(Seq((5L, "2024-01-02 10:00:00", "advance the clock")))
      q.processAllAvailable()
      write(Seq((6L, "2024-01-02 10:00:30", goodText)))
      q.processAllAvailable()
    } finally q.stop()

    val verdicts = spark.table("curated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    // batch funnel on the first four docs agrees verdict for verdict
    // (min-id keeper == first arrival here)
    val batch = graft.operators.Curation.funnel(
        docs.toDF("doc_id", "s", "text"), "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("reason")).toMap
    docs.foreach { case (id, _, _) =>
      assert(verdicts(id) == batch(id),
        s"doc $id: stream ${verdicts(id)} vs batch ${batch(id)}") }
    assert(verdicts(6L) == "kept", s"post-TTL resend: ${verdicts.get(6L)}")
  }

  test("curation judges against the TTL even when stale state survives") {
    // data arrival suppresses a key's timeout callback, so a digest's
    // state can physically outlive firstSeen + TTL; a doc arriving
    // after the TTL (with the watermark already past expiry) must be
    // judged FRESH against the TTL contract, not 'duplicate' against
    // the dead state. maxFilesPerTrigger=1 forces the watermark-
    // advancing file and the resend into separate micro-batches with
    // no empty timeout-only batch between them.
    import spark.implicits._
    val goodText = "the quick brown fox jumps over the lazy dog and then " +
      "the fox runs back to the forest where all of the other animals wait"
    val dir = Files.createTempDirectory("graft-stale").toString
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "s", "text")
        .select(col("doc_id"), to_timestamp(col("s")).as("ts"), col("text"))
        .write.mode("append").parquet(dir)
    write(Seq((1L, "2024-01-01 10:00:00", goodText)))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStream.curateStream(spark, stream, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("stale").start()
    try {
      q.processAllAvailable() // firstSeen 10:00, TTL expiry 11:00
      // watermark-advancer (wm -> 12:00), then the resend at 12:30 —
      // written back-to-back so the resend's batch runs immediately
      // after, data suppressing the timeout, stale state still present
      write(Seq((2L, "2024-01-01 13:00:00", "advance the clock")))
      Thread.sleep(60) // distinct mtimes => deterministic file order
      write(Seq((3L, "2024-01-01 12:30:00", goodText)))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("stale").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(verdicts(1L) == "kept", verdicts)
    assert(verdicts(3L) == "kept",
      s"post-TTL doc judged against dead state: $verdicts")
  }

  test("streaming dedup evicts digest state once the watermark passes") {
    // the property the plain dropDuplicates("digest") variant LACKED:
    // with the event-time column absent from the key set, its state
    // never expired. dropDuplicatesWithinWatermark must (a) dedup
    // within the watermark horizon, (b) evict the digest afterwards so
    // the same content is re-admitted — bounded state on a firehose.
    val dir = Files.createTempDirectory("graft-stream4").toString
    import spark.implicits._
    def writeRows(xs: (Long, String, String)*): Unit =
      xs.toSeq.toDF("event_id", "s", "text")
        .select(col("event_id"), to_timestamp(col("s")).as("ts"),
          col("text"))
        .write.mode("append").parquet(dir)
    writeRows((1L, "2024-01-01 10:00:00", "dup text"),
      (2L, "2024-01-01 10:00:01", "dup text"))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.streamingDedup(stream, "text") // 1 hour watermark
      .writeStream.outputMode("append")
      .format("memory").queryName("evict")
      .start()
    try {
      q.processAllAvailable()
      // advance the watermark to 12:00, past the duplicate's
      // 10:00 + 1 h expiry -> its digest state must be dropped
      writeRows((3L, "2024-01-01 13:00:00", "other"))
      q.processAllAvailable()
      // same content again, above the watermark: re-admitted
      writeRows((4L, "2024-01-01 12:30:00", "dup text"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("evict")
    assert(out.count() == 3, out.collect().mkString("\n"))
    assert(out.filter(col("text") === "dup text").count() == 2)
  }

  test("anomalyGuard verdicts match batch rollingAnomaly across batches") {
    import spark.implicits._
    // two series, spike in 'a'; split MID-SERIES across two micro-batches
    // so the k-cents state must carry the window over the boundary
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 12.0), ("a", 3L, 10.0), ("a", 4L, 12.0),
      ("a", 5L, 10.0), ("a", 6L, 12.0), ("a", 7L, 100.0), ("a", 8L, 12.0),
      ("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0), ("b", 4L, 9.0))
    val batchDf = rows.toDF("serie_id", "indice_tiempo", "valor")
    val expected = graft.operators.TimeSeriesOps
      .rollingAnomaly(batchDf, k = 4, kSigma = 2, minObs = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(r.fieldIndex("n_w")), r.getBoolean(r.fieldIndex("anomaly")),
          Option(r.getAs[java.lang.Double]("zscore")).map(_.toDouble))))
      .toMap

    val dir = Files.createTempDirectory("graft-anom").toString
    def write(chunk: Seq[(String, Long, Double)]): Unit =
      chunk.toDF("serie_id", "indice_tiempo", "valor")
        .write.mode("append").parquet(dir)
    write(rows.take(5))
    val schema = batchDf.schema
    val q = EventStream.anomalyGuard(spark,
        spark.readStream.schema(schema).parquet(dir), k = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom").start()
    try {
      q.processAllAvailable()
      write(rows.drop(5))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("anom").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4),
          Option(r.getAs[java.lang.Double]("zscore")).map(_.toDouble))))
      .toMap
    assert(got.keySet == expected.keySet, s"row sets differ: $got")
    for ((key, exp) <- expected)
      assert(got(key) == exp, s"$key: stream ${got(key)} != batch $exp")
    // sanity: the spike and the flat-window deviation both flagged
    assert(got(("a", 7L))._2 && got(("b", 4L))._2)
  }

  test("streaming heavy hitters keep every true-frequent token across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mgstream").toString
    // one file per write -> one micro-batch per write, 5 rows emitted each
    def write(rows: Seq[(String, String)]): Unit =
      rows.toDF("grp", "tok").coalesce(1).write.mode("append").parquet(dir)
    // batch 1: 'alpha' dominant; batch 2 shifts mass to 'omega'
    val b1 = Seq.fill(40)(("en", "alpha")) ++ Seq.fill(25)(("en", "beta")) ++
      (1 to 30).map(i => ("en", s"rare$i"))
    val b2 = Seq.fill(50)(("en", "omega")) ++ Seq.fill(10)(("en", "alpha")) ++
      (1 to 20).map(i => ("en", s"tail$i"))
    write(b1)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tok",
        org.apache.spark.sql.types.StringType)))
    val cap = 16
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.heavyHittersStream(spark, stream, "grp", "tok",
        cap = cap, topK = 5)
      .writeStream.outputMode("update")
      .format("memory").queryName("mghh").start()
    try {
      q.processAllAvailable()
      write(b2)
      q.processAllAvailable()
    } finally q.stop()

    // Update mode appends one rank-1..k run per batch; the sink does
    // NOT preserve batch order, so the last emission is identified by
    // its n_seen stamp (the group's running token total), not position
    val all = spark.table("mghh").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(all.count(_._3 == 1) == 2, s"want 2 batch emissions, got ${all.toSeq}")
    assert(all.map(_._4).toSet == Set(95L, 175L), s"n_seen stamps: ${all.toSeq}")
    val lastTop = all.filter(_._4 == 175L).map(x => (x._1, x._2, x._3))
    // MG guarantee over the WHOLE stream: true count > N/(cap+1) must
    // be in the candidate set; here N=175, bar ~10.3 — alpha(50),
    // beta(25), omega(50) all clear it and must appear in the top-5
    val toks = lastTop.map(_._1).toSet
    for (t <- Seq("alpha", "beta", "omega"))
      assert(toks.contains(t), s"$t missing from $toks")
    // residual counts are lower bounds on true counts
    val counts = lastTop.map(x => x._1 -> x._2).toMap
    assert(counts("alpha") <= 50L && counts("omega") <= 50L &&
      counts("beta") <= 25L)
  }

  test("streaming kmv distinct matches batch kmvDistinct on every prefix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kmvstream").toString
    def write(rows: Seq[(String, Long)]): Unit =
      rows.toDF("grp", "v").coalesce(1).write.mode("append").parquet(dir)
    // "lo" stays under k (exact), "hi" crosses it (estimate); batch 2
    // repeats some batch-1 values (distinctness across batches)
    val b1 = (1 to 30).map(i => ("lo", i.toLong)) ++
      (1 to 200).map(i => ("hi", i.toLong))
    val b2 = (21 to 45).map(i => ("lo", i.toLong)) ++
      (101 to 500).map(i => ("hi", i.toLong))
    write(b1)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.kmvDistinctStream(spark, stream, "grp", "v", k = 64)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmvstream").start()
    def batchAnswer(rows: Seq[(String, Long)]): Map[String, (Double, Long)] =
      graft.operators.Sketches.kmvDistinct(rows.toDF("grp", "v"), "grp", "v",
          k = 64)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2))).toMap
    try {
      q.processAllAvailable()
      val got1 = spark.table("kmvstream").collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(got1 == batchAnswer(b1), s"prefix 1: $got1")
      write(b2)
      q.processAllAvailable()
      // Update mode: latest emission per group. n_seen caps at k so it
      // can tie across batches; the estimate is monotone nondecreasing
      // (the k-th min only shrinks), so (n_seen, estimate) orders
      // emissions chronologically.
      val got2 = spark.table("kmvstream").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1).map { case (g, xs) =>
          val last = xs.maxBy(x => (x._3, x._2)); g -> (last._2, last._3) }
      assert(got2 == batchAnswer(b1 ++ b2), s"prefix 2: $got2")
    } finally q.stop()
  }

  test("streaming cms watchlist matches the batch sketch on every prefix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cmsstream").toString
    def write(rows: Seq[(String, String)]): Unit =
      rows.toDF("grp", "v").coalesce(1).write.mode("append").parquet(dir)
    val (depth, width) = (4, 32) // narrow on purpose: collisions real
    val watch = Seq("alpha", "beta", "ghost") // ghost: never inserted
    val b1 = (1 to 50).map(_ => ("g", "alpha")) ++
      (1 to 20).map(_ => ("g", "beta")) ++
      (1 to 300).map(i => ("g", s"noise${i % 90}"))
    val b2 = (1 to 25).map(_ => ("g", "beta")) ++
      (1 to 200).map(i => ("g", s"noise${i % 70}"))
    write(b1)

    // batch-mode CMS estimate over a prefix, via the JVM twin of the
    // exact production arithmetic (asserted equal to the Column form
    // in OperatorsSpec)
    def batchAnswer(rows: Seq[(String, String)]): Map[String, Long] = {
      val counters = Array.ofDim[Long](depth * width)
      rows.foreach { case (_, v) =>
        val h = graft.functions.GF.hash32Jvm(v)
        for (i <- 0 until depth) {
          val u = (h * (2L * i + 1) + (101L * i + 17)) % 4294967311L
          counters(i * width + (u % width).toInt) += 1L
        }
      }
      watch.map { w =>
        val h = graft.functions.GF.hash32Jvm(w)
        w -> (0 until depth).map { i =>
          val u = (h * (2L * i + 1) + (101L * i + 17)) % 4294967311L
          counters(i * width + (u % width).toInt)
        }.min
      }.toMap
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.cmsFreqStream(spark, stream, "grp", "v", watch,
        depth, width)
      .writeStream.outputMode("update")
      .format("memory").queryName("cmsstream").start()
    try {
      q.processAllAvailable()
      // Update mode: latest emission per (grp, key) = max n_seen
      def latest(): Map[String, Long] =
        spark.table("cmsstream").collect()
          .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
          .groupBy(_._1).map { case (k, xs) => k -> xs.maxBy(_._3)._2 }
      val exp1 = batchAnswer(b1)
      assert(latest() == exp1, s"prefix 1: ${latest()} vs $exp1")
      // one-sided even for the never-inserted key
      assert(exp1("ghost") >= 0L)
      write(b2)
      q.processAllAvailable()
      val exp2 = batchAnswer(b1 ++ b2)
      assert(latest() == exp2, s"prefix 2: ${latest()} vs $exp2")
    } finally q.stop()
  }

  test("streaming hdr quantiles match the batch column path on every prefix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hdrstream").toString
    def write(rows: Seq[(String, Long)]): Unit =
      rows.toDF("grp", "v").coalesce(1).write.mode("append").parquet(dir)
    val sBits = 5 // coarse on purpose: approximation real, bound still 2^-5
    val phis = Seq(0.25, 0.5, 0.99)
    val b1 = (1 to 400).map(i => ("g", (i * i).toLong)) ++
      (1 to 100).map(_ => ("g", 3L))
    val b2 = (1 to 300).map(i => ("g", (700000 + i * 31).toLong))
    write(b1)

    // batch answer over a prefix via the PRODUCTION Column path
    // (hdrAgg + hdrQuantile), so this asserts stream handler ==
    // aggregate == projection in one go
    def batchAnswer(rows: Seq[(String, Long)]): Map[Double, Long] = {
      val sk = rows.toDF("grp", "v")
        .agg(graft.operators.Sketches.hdrAgg(col("v"), sBits).as("hdr"))
      phis.map { phi =>
        phi -> sk.select(graft.operators.Sketches
          .hdrQuantile(col("hdr"), phi, sBits)).head().getLong(0)
      }.toMap
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.hdrQuantileStream(spark, stream, "grp", "v",
        phis, sBits)
      .writeStream.outputMode("update")
      .format("memory").queryName("hdrstream").start()
    try {
      q.processAllAvailable()
      // Update mode: latest emission per (grp, phi) = max n_seen
      def latest(): Map[Double, Long] =
        spark.table("hdrstream").collect()
          .map(r => (r.getDouble(1), r.getLong(2), r.getLong(3)))
          .groupBy(_._1).map { case (p, xs) => p -> xs.maxBy(_._3)._2 }
      val exp1 = batchAnswer(b1)
      assert(latest() == exp1, s"prefix 1: ${latest()} vs $exp1")
      write(b2)
      q.processAllAvailable()
      val exp2 = batchAnswer(b1 ++ b2)
      assert(latest() == exp2, s"prefix 2: ${latest()} vs $exp2")
    } finally q.stop()
  }

  test("streaming psi drift matches batch psiDrift on every prefix") {
    import spark.implicits._
    import graft.operators.Profiling
    val dir = Files.createTempDirectory("graft-psistream").toString
    def write(rows: Seq[(String, Long)]): Unit =
      rows.toDF("grp", "v").coalesce(1).write.mode("append").parquet(dir)

    // reference: uniform over [0, 100); current drifts upward batch 2
    val ref = (1 to 300).map(i => ("g", (i % 100).toLong)) ++
      (1 to 100).map(i => ("h", (i % 50).toLong))
    val refDf = ref.toDF("grp", "v")
    val hist = EventStream.refHistogram(refDf, "v", "grp", bins = 10)
    assert(hist("g")._3.sum == 300L && hist.contains("h"))

    val b1 = (1 to 120).map(i => ("g", (i % 100).toLong)) ++
      (1 to 30).map(i => ("h", (i % 50).toLong)) ++
      Seq(("unknown_grp", 5L)) // absent from reference -> no emission
    val b2 = (1 to 80).map(i => ("g", (60 + i % 40).toLong)) // drift up
    write(b1)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.psiDriftStream(spark, stream, "v", "grp", hist,
        bins = 10)
      .writeStream.outputMode("update")
      .format("memory").queryName("psidrift").start()
    try {
      q.processAllAvailable()
      write(b2)
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("psidrift").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(!out.exists(_._1 == "unknown_grp"))

    // batch PSI of each prefix must match the stream's emission for it
    def batchPsi(cur: Seq[(String, Long)]): Map[String, (Double, Long)] =
      Profiling.psiDrift(refDf, cur.toDF("grp", "v"), "v", "grp", 10)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2))).toMap
    val p1 = batchPsi(b1.filter(x => x._1 == "g" || x._1 == "h"))
    val p2 = batchPsi((b1 ++ b2).filter(x => x._1 == "g" || x._1 == "h"))
    // emissions keyed by (grp, n_cur) — prefix sizes differ, so unique
    val got = out.map(o => (o._1, o._3) -> (o._2, o._4)).toMap
    for ((grp, nCur, exp) <- Seq(("g", 120L, p1("g")), ("h", 30L, p1("h")),
        ("g", 200L, p2("g")), ("h", 30L, p2("h")))) {
      val (psi, bins) = got((grp, nCur))
      assert(math.abs(psi - exp._1) <= 1.1e-6,
        s"$grp@$nCur: stream $psi vs batch ${exp._1}")
      assert(bins == exp._2, s"$grp@$nCur bins: $bins vs ${exp._2}")
    }
    // the drifted prefix must actually read as drift
    assert(p2("g")._1 > 0.1 && p2("g")._1 > p1("g")._1)
  }

  test("streaming funnel advancements match batch funnel counts") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    val S = 1000000L
    val dir = Files.createTempDirectory("graft-funstream").toString
    def write(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("user_id", "event_type", "us")
        .coalesce(1).write.mode("append").parquet(dir)
    // batch 1: user 1 views+clicks; user 2's click precedes its view
    // INSIDE the batch (intra-batch disorder — the sort must fix it);
    // user 3 views only
    val b1 = Seq((1L, "view", 1L * S), (1L, "click", 3L * S),
      (2L, "click", 4L * S), (2L, "view", 5L * S),
      (3L, "view", 9L * S))
    // batch 2: user 1 purchases; user 2 clicks after its view;
    // user 3 purchases without clicking (must NOT advance)
    val b2 = Seq((1L, "purchase", 12L * S), (2L, "click", 14L * S),
      (3L, "purchase", 15L * S))
    write(b1)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("us",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.funnelStream(spark, stream,
        Seq("view", "click", "purchase"))
      .writeStream.outputMode("update")
      .format("memory").queryName("funstream").start()
    try {
      q.processAllAvailable()
      write(b2)
      q.processAllAvailable()
    } finally q.stop()

    val adv = spark.table("funstream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    // per-step advancement counts equal the batch funnel over the log
    val batch = EventAnalytics.funnel(
        (b1 ++ b2).toDF("user_id", "event_type", "us"),
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val streamed = adv.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(streamed == batch.filter(_._2 > 0),
      s"stream $streamed vs batch $batch")
    // lags carry exact µs deltas; step-1 rows carry none
    assert(adv.filter(_._2 == 1).forall(_._5.isEmpty))
    assert(adv.find(a => a._1 == 1L && a._2 == 2).get._5.contains(2L * S))
    assert(adv.find(a => a._1 == 2L && a._2 == 2).get._5.contains(9L * S))
    // user 3 never clicked: its purchase is not an advancement
    assert(!adv.exists(a => a._1 == 3L && a._2 == 3))
  }

  test("streaming crawl feeds the corpus lake via foreachBatch upsert") {
    import spark.implicits._
    val lakeDir = Files.createTempDirectory("graft-streamlake").toString
    val feedDir = Files.createTempDirectory("graft-feed").toString
    // seed lake with an initial corpus
    val seed = (1L to 20L).map(i => (i, s"seed document number $i"))
      .toDF("doc_id", "text")
    CorpusLake.writeShards(seed, "doc_id", lakeDir, epoch = 1, nShards = 4)

    def feed(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(feedDir)
    // batch 1 carries two new docs + a re-crawl of doc 5 (must skip);
    // batch 2 carries one more new doc
    feed(Seq((101L, "crawled doc A"), (102L, "crawled doc B"),
      (5L, "RECRAWLED five")))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema).parquet(feedDir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        CorpusLake.upsertBatch(spark, lakeDir, "doc_id", batch)
        ()
      }.start()
    try {
      q.processAllAvailable()
      feed(Seq((103L, "crawled doc C")))
      q.processAllAvailable()
    } finally q.stop()

    val lake = CorpusLake.read(spark, lakeDir)
    assert(lake.count() == 23L) // 20 seed + 3 new, re-crawl skipped
    val five = lake.filter(col("doc_id") === 5L)
      .select("text").collect().head.getString(0)
    assert(five == "seed document number 5", five)
    assert(lake.filter(col("doc_id") >= 101L).count() == 3L)
    // baked order still holds lake-wide after two streaming upserts
    val rows = lake.select("split", "shard", "shuffle_key", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      val keys = rs.map(x => (x._3, x._4)).toSeq
      assert(keys == keys.sorted, "stream upsert broke baked order")
    }
  }

  test("drift-gated lake ingestion quarantines drifted micro-batches") {
    import spark.implicits._
    val lakeDir = Files.createTempDirectory("graft-gatelake").toString
    val feedDir = Files.createTempDirectory("graft-gatefeed").toString
    val quarDir = Files.createTempDirectory("graft-quarantine").toString + "/q"

    // reference corpus: two languages, n_chars uniform-ish per lang
    val ref = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "es", (50 + i % 100).toLong))
      .toDF("doc_id", "lang", "n_chars")
    CorpusLake.writeShards(ref, "doc_id", lakeDir, epoch = 1, nShards = 4)
    val refHist = EventStream.refHistogram(ref, "n_chars", "lang", bins = 10)

    def feed(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "lang", "n_chars").coalesce(1)
        .write.mode("append").parquet(feedDir)

    // batch 1: in-distribution (same generator, fresh ids) -> admitted
    val good = (1001L to 1100L).map(i =>
      (i, if (i % 2 == 0) "en" else "es", (50 + i % 100).toLong))
    feed(good)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val q = EventStream.driftGatedLakeWriter(
      spark.readStream.schema(schema).parquet(feedDir),
      lakeDir, quarDir, "doc_id", "n_chars", "lang", refHist,
      bins = 10, threshold = 0.25).start()
    try {
      q.processAllAvailable()
      assert(CorpusLake.read(spark, lakeDir).count() == 300L,
        "in-distribution batch was not admitted")
      assert(!new java.io.File(quarDir).exists(),
        "in-distribution batch was quarantined")

      // batch 2: length distribution shifted far up -> PSI drift
      feed((2001L to 2100L).map(i => (i, "en", 5000L + i % 10)))
      q.processAllAvailable()
      // batch 3: a language the reference has never seen -> drift
      feed((3001L to 3050L).map(i => (i, "zz", (50 + i % 100).toLong)))
      q.processAllAvailable()
      // batch 4: in-distribution but with NULL metric rows mixed in —
      // the gate must drop the nulls (one bad row must not NPE the
      // whole ingest stream) and admit on the non-null mass
      (4001L to 4100L).map(i =>
        (i, if (i % 2 == 0) "en" else "es",
          if (i % 10 == 0) None else Some((50 + i % 100).toLong)))
        .toDF("doc_id", "lang", "n_chars").coalesce(1)
        .write.mode("append").parquet(feedDir)
      q.processAllAvailable()
    } finally q.stop()

    // drifted batches quarantined; clean + null-bearing batches admitted
    val lake = CorpusLake.read(spark, lakeDir)
    assert(lake.count() == 400L, "a drifted batch leaked into the lake")
    assert(lake.filter(col("doc_id").between(2000L, 3999L)).count() == 0L)
    assert(lake.filter(col("doc_id") >= 4000L).count() == 100L,
      "null-bearing in-distribution batch was not admitted")
    val quar = spark.read.parquet(quarDir)
    assert(quar.count() == 150L, "quarantine is missing drifted rows")
    assert(quar.select("batch_id").distinct().count() == 2L)
    // the shifted batch is annotated with its offending group + PSI
    val shifted = quar.filter(col("doc_id") === 2001L).collect().head
    assert(shifted.getString(shifted.fieldIndex("drift_group")) == "en")
    assert(shifted.getDouble(shifted.fieldIndex("drift_psi")) > 0.25)
    // the unseen-language batch carries the sentinel (null PSI)
    val unseen = quar.filter(col("doc_id") === 3001L).collect().head
    assert(unseen.getString(unseen.fieldIndex("drift_group")) == "zz")
    assert(unseen.isNullAt(unseen.fieldIndex("drift_psi")))
  }

  test("index-backed streaming dedup: whole-corpus memory, cross-batch, restart-safe") {
    import spark.implicits._
    val idxDir = Files.createTempDirectory("graft-sdidx").toString
    val feedDir = Files.createTempDirectory("graft-sdfeed").toString
    val outDir = Files.createTempDirectory("graft-sdout").toString + "/out"
    val dupDir = Files.createTempDirectory("graft-sddup").toString + "/dup"

    // historical corpus already indexed before the stream starts
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.writeSignatureIndex(corpus, "text", "doc_id", idxDir)

    def feed(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(feedDir)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // batch 1: one copy of the historical corpus, one novel doc
    feed(Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "totally unrelated corpus content about engines")))
    val q = EventStream.indexDedupWriter(
      spark.readStream.schema(schema).parquet(feedDir),
      idxDir, outDir, dupDir, "text", "doc_id").start()
    try {
      q.processAllAvailable()
      // batch 2: a copy of batch 1's NOVEL doc (cross-batch dedup via
      // the index upsert), a fresh doc, a SAME-BATCH copy of that fresh
      // doc (the index can't know it yet — the within-batch digest
      // guard must), and batch-1's id 11 reused with NEW content (must
      // be admitted AND indexed despite the seen id)
      feed(Seq(
        (20L, "totally unrelated corpus content about engines"),
        (21L, "brand new never seen text with many unique words here"),
        (21L, "brand new never seen text with many unique words here"),
        (22L, "brand new never seen text with many unique words here"),
        (11L, "reused identifier carrying completely different words"),
        (12L, "first body of text under a twice used identifier"),
        (12L, "second body of text under a twice used identifier")))
      q.processAllAvailable()
    } finally q.stop()

    // (21, same text) twice collapses to ONE admitted row (row-grain
    // key dedup); id 12's two DIFFERENT contents are both novel and
    // both admitted — neither cross-products nor damns its sibling
    val out = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(out == Seq(11L, 11L, 12L, 12L, 21L), s"novel set wrong: $out")
    val dups = spark.read.parquet(dupDir)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getLong(r.fieldIndex("n_hits"))).toMap
    assert(dups.keySet == Set(10L, 20L, 22L), s"dup set wrong: $dups")
    // same-batch extra has zero CORPUS hits — flagged by the digest guard
    assert(dups(22L) == 0L && dups(10L) >= 1L && dups(20L) >= 1L)
    // the on-disk index now covers the streamed novel docs too: a fresh
    // (restarted) probe flags copies of them without any stream state —
    // including the reused-id content (the skipExisting=false path)
    val probe = graft.operators.Dedup.dedupAgainstIndex(
      Seq((30L, "brand new never seen text with many unique words here"),
        (31L, "reused identifier carrying completely different words"))
        .toDF("doc_id", "text"), "text", "doc_id", idxDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(probe(30L), "index missed a streamed novel doc after restart")
    assert(probe(31L), "reused-id content never entered the index")
  }
}
