package graft.streaming

import graft.GraftCheckpointOps
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

  /** Per-user buffer of not-yet-sealed events: (ts_us, event_id,
    * value). Holding the events (not a fold summary) is what makes
    * out-of-order arrival inside the watermark horizon exact: every
    * invocation re-sorts and re-folds, so a late event can extend a
    * session's start, merge two provisional sessions, or open an
    * earlier one — exactly as the batch sort-then-fold would. */
  final case class SessionBuf(events: Seq[(Long, Long, Double)])
  final case class ClosedSession(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, sum_value: Double)

  /** TRUE event-time session windows: the incremental form of batch
    * q24_sessionize. A session is a maximal run of a user's events with
    * inter-event gaps <= `gapUs` (MICROSECONDS); a session SEALS — and
    * is emitted, Append mode — only once the watermark passes
    * `last_event + gap`, because until then a late event (still above
    * the watermark) could legally extend or merge it. Sealing happens
    * either on arrival of newer events for the user or via
    * EventTimeTimeout for quiet users. Results match the batch window
    * computation exactly for every sealed session, including
    * out-of-order arrival ACROSS micro-batches: state buffers the
    * user's unsealed events and each invocation re-folds the sorted
    * buffer, so `session_start` is min'd down by late events and an
    * event from a distinct earlier run opens its own session instead
    * of being absorbed. State per user is the events of its unsealed
    * sessions — bounded by the watermark horizon (everything older
    * seals and leaves state), never by stream length. */
  def sessionWindows(spark: SparkSession, events: DataFrame,
      gapUs: Long = 1800L * 1000000L,
      watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    // session bookkeeping in MICROSECONDS (Timestamp.getTime would
    // truncate to ms and disagree with the batch µs gap comparison on
    // sub-ms data), rounding HALF_UP like Spark's round()
    def usOf(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    // sort-then-fold into maximal gap-bounded runs — the batch
    // window recurrence, applied to the full unsealed buffer
    def sessionsOf(evs: Seq[(Long, Long, Double)])
        : List[Vector[(Long, Long, Double)]] = {
      val sorted = evs.sortBy(e => (e._1, e._2))
      val groups = List.newBuilder[Vector[(Long, Long, Double)]]
      var cur = Vector.empty[(Long, Long, Double)]
      sorted.foreach { e =>
        if (cur.isEmpty || e._1 - cur.last._1 <= gapUs) cur :+= e
        else { groups += cur; cur = Vector(e) }
      }
      if (cur.nonEmpty) groups += cur
      groups.result()
    }
    def closedOf(u: Long, g: Vector[(Long, Long, Double)]): ClosedSession =
      ClosedSession(u, tsOf(g.head._1), tsOf(g.last._1), g.size.toLong,
        BigDecimal(g.iterator.map(_._3).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionBuf]) =>
          val fresh =
            if (state.hasTimedOut) Seq.empty
            else rows.map(e => (usOf(e.ts), e.event_id, e.value)).toSeq
          val buf = state.getOption.map(_.events).getOrElse(Seq.empty) ++ fresh
          val groups = sessionsOf(buf)
          val wmMs = state.getCurrentWatermarkMs()
          // a session is immune to change once every event that could
          // extend it (ts <= last+gap) is below the watermark; sealed
          // sessions form a PREFIX of the ordered groups because
          // last(i) + gap < start(i+1) <= last(i+1) by construction
          val (toSeal, open) =
            groups.partition(g => (g.last._1 + gapUs) / 1000L <= wmMs)
          if (open.nonEmpty) {
            state.update(SessionBuf(open.flatten))
            // next seal opportunity: the EARLIEST open session's
            // last+gap; ceil to ms so the timeout never fires early.
            // Strictly above the watermark by the partition condition.
            state.setTimeoutTimestamp(
              Math.addExact(open.head.last._1 + gapUs, 999L) / 1000L)
          } else if (state.exists) state.remove()
          toSeal.map(closedOf(userId, _)).iterator
      }.toDF()
  }

  final case class LangDoc(lang: String, n_tokens: Long)
  final case class LangAgg(n_docs: Long, total_tokens: Long)
  final case class LangStat(lang: String, n_docs: Long,
      total_tokens: Long)

  /** Incremental corpus statistics on the ARBITRARY-STATE V2 API
    * (`transformWithState` + `StatefulProcessor` + typed `ValueState`,
    * Spark 4 state-store v2 — the successor of mapGroupsWithState;
    * requires the RocksDB state store provider). Per-language running
    * doc/token totals update each micro-batch — the incremental form of
    * the batch corpus-stats aggregation, emitted in Update mode. State
    * per key is one (long, long) value row in RocksDB; TTL is off
    * because language keys are a tiny closed set. */
  class RunningLangStats
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, LangDoc, LangStat] {
    @transient private var agg:
        org.apache.spark.sql.streaming.ValueState[LangAgg] = _
    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      agg = getHandle.getValueState[LangAgg]("agg",
        org.apache.spark.sql.Encoders.product[LangAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[LangDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[LangStat] = {
      val prev = Option(agg.get()).getOrElse(LangAgg(0L, 0L))
      var docs = prev.n_docs
      var toks = prev.total_tokens
      rows.foreach { d => docs += 1; toks += d.n_tokens }
      agg.update(LangAgg(docs, toks))
      Iterator.single(LangStat(key, docs, toks))
    }
  }

  /** Run [[RunningLangStats]] over a stream carrying `lang` and
    * `n_tokens` columns. */
  def runningLangStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.selectExpr("lang", "n_tokens").as[LangDoc]
      .groupByKey(_.lang)
      .transformWithState(new RunningLangStats,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
      .toDF()
  }

  final case class SeriesPoint(serie_id: String,
      indice_tiempo: java.sql.Date, valor: Double)
  final case class SeriesViolation(serie_id: String,
      indice_tiempo: java.sql.Date, kind: String)

  /** Incremental T3/T4: the batch validation battery's monotonic and
    * declared-frequency checks running against a stream of series
    * points. Per-serie state is the last accepted period (one epoch-day
    * long — metadata-scale, bounded by series count, so no timeout is
    * needed); each arriving point emits `duplicate`, `out_of_order`, or
    * `gap` violation rows exactly as the batch operators would flag
    * them at the same arrival order. Points inside one micro-batch are
    * sorted by period first, so intra-batch disorder is not
    * misreported. `freqMonths` is the declared frequency (1=monthly,
    * 3=quarterly, ...); gaps are months_between != freqMonths. */
  def seriesGuard(spark: SparkSession, points: DataFrame,
      freqMonths: Int): DataFrame = {
    import spark.implicits._
    points.selectExpr("serie_id", "indice_tiempo", "valor").as[SeriesPoint]
      .groupByKey(_.serie_id)
      .flatMapGroupsWithState[Long, SeriesViolation](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (serie: String, rows: Iterator[SeriesPoint],
            state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(_.indice_tiempo.toLocalDate.toEpochDay)
          val out = List.newBuilder[SeriesViolation]
          var last = state.getOption // epoch day of last accepted period
          sorted.foreach { p =>
            val d = p.indice_tiempo.toLocalDate
            val day = d.toEpochDay
            last match {
              case Some(prev) if day == prev =>
                out += SeriesViolation(serie, p.indice_tiempo, "duplicate")
              case Some(prev) if day < prev =>
                out += SeriesViolation(serie, p.indice_tiempo, "out_of_order")
              case Some(prev) =>
                // match batch frequencyGaps, which uses Spark's
                // months_between: the difference is an exact integer
                // when the days-of-month agree OR both dates are the
                // last day of their month — so a month-end-anchored
                // monthly series (Jan 31 -> Feb 28 -> Mar 31) is clean
                // in both engines. Anything fractional, or the wrong
                // whole-month count, is a gap.
                val prevDate = java.time.LocalDate.ofEpochDay(prev)
                val calMonths = (d.getYear * 12 + d.getMonthValue) -
                  (prevDate.getYear * 12 + prevDate.getMonthValue)
                val exactStep = d.getDayOfMonth == prevDate.getDayOfMonth ||
                  (d.getDayOfMonth == d.lengthOfMonth &&
                    prevDate.getDayOfMonth == prevDate.lengthOfMonth)
                if (!exactStep || calMonths != freqMonths)
                  out += SeriesViolation(serie, p.indice_tiempo, "gap")
                last = Some(day)
              case None =>
                last = Some(day)
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }.toDF()
  }

  final case class AnomalyPoint(serie_id: String, indice_tiempo: Long,
      valor: Double)
  final case class AnomalyVerdict(serie_id: String, indice_tiempo: Long,
      valor: Double, n_w: Long, anomaly: Boolean, zscore: Option[Double])

  /** Incremental rolling z-score anomaly screen — the streaming
    * counterpart of `TimeSeriesOps.rollingAnomaly`, same exact-integer
    * verdict: each arriving point is tested against the k trailing
    * PREDECESSOR cents held in state (`(n·x − s)² > kσ²·(n·sq − s²)`,
    * all integer), then pushed into the window. State per serie is at
    * most k longs — bounded regardless of stream length, no timeout
    * needed. Points inside a micro-batch are sorted by period first;
    * like the batch operator, the verdict sequence matches batch
    * exactly when points arrive in period order across batches. The
    * reported zscore rounds half-up at 6 dp like Spark's `round`. */
  def anomalyGuard(spark: SparkSession, points: DataFrame, k: Int,
      kSigma: Int = 2, minObs: Int = 3): DataFrame = {
    import spark.implicits._
    val k2 = kSigma.toLong * kSigma
    points.selectExpr("serie_id", "indice_tiempo", "valor")
      .as[AnomalyPoint]
      .groupByKey(_.serie_id)
      .flatMapGroupsWithState[List[Long], AnomalyVerdict](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (serie: String, rows: Iterator[AnomalyPoint],
            state: GroupState[List[Long]]) =>
          var window = state.getOption.getOrElse(Nil) // oldest first, <= k
          val out = List.newBuilder[AnomalyVerdict]
          rows.toSeq.sortBy(_.indice_tiempo).foreach { p =>
            val x = math.round(p.valor * 100)
            val n = window.size.toLong
            val s = window.sum
            val sq = window.iterator.map(c => c * c).sum
            val dev = n * x - s
            val varn = n * sq - s * s
            val anomaly = n >= minObs && dev * dev > k2 * varn
            val z = if (n >= minObs && varn > 0)
              Some(BigDecimal(dev.toDouble / math.sqrt(varn.toDouble))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            else None
            out += AnomalyVerdict(serie, p.indice_tiempo, p.valor, n,
              anomaly, z)
            window = (window :+ x).takeRight(k)
          }
          state.update(window)
          out.result().iterator
      }.toDF()
  }

  final case class ScoredDoc(doc_id: Long, ts: java.sql.Timestamp,
      digest: String, n_tokens: Long, quality_score: Double)
  final case class CuratedDoc(doc_id: Long, ts: java.sql.Timestamp,
      reason: String, n_tokens: Long, quality_score: Double)

  /** Incremental curation funnel: the batch funnel's per-row rules
    * (length, quality — stateless codegen'd projections) run unchanged
    * on the stream; the DUPLICATE rule becomes digest-keyed custom
    * state — the first arrival of a content digest is judged by the
    * remaining rules, later arrivals within the TTL horizon are labeled
    * `duplicate` (the streaming analogue of the batch min-id keeper:
    * first-seen wins, ties inside a micro-batch broken by (ts,
    * doc_id)). Unlike `dropDuplicatesWithinWatermark`, duplicates are
    * EMITTED with their verdict, not silently dropped — the funnel
    * report stays complete. State per digest is one long (first-seen
    * ms) with an event-time timeout at `firstSeen + dedupTtlMs`, so a
    * crawler firehose holds state proportional to the horizon, never
    * the stream. Input needs `doc_id`, an event-time column, and the
    * text column. */
  def curateStream(spark: SparkSession, docs: DataFrame, textCol: String,
      tsCol: String = "ts", minTokens: Int = 20, minQuality: Double = 0.55,
      watermark: String = "1 hour",
      dedupTtlMs: Long = 3600000L): DataFrame = {
    import spark.implicits._
    val scored = graft.operators.TextAnalysis.qualityScore(
        docs.withColumn("digest",
          md5(graft.operators.Dedup.normalizeText(col(textCol)))), textCol)
      .select(col("doc_id"), col(tsCol).as("ts"), col("digest"),
        col("n_tokens"), col("quality_score")).as[ScoredDoc]
    scored
      .withWatermark("ts", watermark)
      .groupByKey(_.digest)
      .flatMapGroupsWithState[Long, CuratedDoc](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (digest: String, rows: Iterator[ScoredDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            // Stale state can outlive its TTL when data arrival keeps
            // suppressing the timeout callback: judge expiry against
            // the CURRENT watermark first, so a doc arriving after
            // firstSeen + TTL is a fresh arrival (and re-establishes
            // first-seen state), not a duplicate of dead state.
            val wmMs = state.getCurrentWatermarkMs()
            if (state.getOption.exists(_ + dedupTtlMs <= wmMs))
              state.remove()
            val seenBefore = state.exists
            val out = sorted.zipWithIndex.map { case (d, i) =>
              val reason =
                if (seenBefore || i > 0) "duplicate"
                else if (d.n_tokens < minTokens) "too_short"
                else if (d.quality_score < minQuality) "low_quality"
                else "kept"
              CuratedDoc(d.doc_id, d.ts, reason, d.n_tokens,
                d.quality_score)
            }
            val firstSeen = state.getOption
              .getOrElse(sorted.head.ts.getTime)
            val expiry = firstSeen + dedupTtlMs
            if (expiry > wmMs) {
              state.update(firstSeen)
              state.setTimeoutTimestamp(expiry)
            } else if (state.exists) state.remove()
            out.iterator
          }
      }.toDF()
  }

  /** STREAM-STREAM interval join: enrich an event stream with a
    * reference-mark stream — every event pairs with the marks of the
    * same user whose timestamp lies in `[event.ts - lookbackSec,
    * event.ts]` (the bounded-lateness analogue of the batch as-of
    * pattern). Both sides are watermarked and the join condition bounds
    * the time skew, so Spark can EVICT state: a mark leaves the state
    * store once the event-side watermark passes `mark.ts +
    * lookbackSec`, and state stays proportional to the lookback
    * horizon, never the stream. Inner join: events with no mark in the
    * window are dropped (use the batch asofJoin for left semantics —
    * streaming left outer would emit nulls only on watermark close). */
  def enrichWithMarks(events: DataFrame, marks: DataFrame,
      lookbackSec: Long, watermark: String = "1 hour"): DataFrame = {
    val ev = events.selectExpr("event_id", "ts", "user_id", "value")
      .withWatermark("ts", watermark)
    val mk = marks
      .selectExpr("user_id AS m_user_id", "ts AS m_ts",
        "value AS mark_value")
      .withWatermark("m_ts", watermark)
    ev.join(mk,
      col("user_id") === col("m_user_id") &&
        col("m_ts") >= col("ts") - expr(s"interval $lookbackSec seconds") &&
        col("m_ts") <= col("ts"))
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("m_ts"), col("mark_value"))
  }

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

  final case class TokRow(grp: String, tok: String)
  final case class MgEntry(tok: String, n: Long)
  final case class MgState(entries: Seq[MgEntry], nSeen: Long)
  /** `n_seen` is the group's total token count so far — it dates each
    * emission (a memory/file sink does not preserve batch order) and
    * gives the N in the N/(cap+1) containment bound. */
  final case class MgTop(grp: String, tok: String, n: Long, rank: Int,
      n_seen: Long)

  /** Streaming vocabulary heavy hitters: the incremental form of
    * Sketches.heavyHitters — per group, a BOUNDED Misra-Gries summary
    * (≤ `cap` residual counters) carried as stream state, with the
    * current top-`topK` candidates emitted each micro-batch (Update
    * mode). Same guarantee as batch: any token whose true frequency in
    * the stream so far exceeds N/(cap+1) is present in state — the
    * stream never stores the vocabulary, only the candidate set, so
    * state is O(groups × cap) regardless of stream length. Residual
    * counts are lower bounds (and merge-order-dependent), so ranks are
    * indicative; exact ranks come from a batch re-count of the
    * candidates. Group keys are assumed a small closed set (languages,
    * sources) — no timeout evicts them. */
  def heavyHittersStream(spark: SparkSession, toks: DataFrame,
      grpCol: String, tokCol: String, cap: Int = 64,
      topK: Int = 10): DataFrame = {
    import spark.implicits._
    val agg = new graft.operators.Sketches.MisraGriesAgg(cap)
    toks.select(col(grpCol).cast("string").as("grp"),
        col(tokCol).cast("string").as("tok")).as[TokRow]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[MgState, MgTop](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[TokRow], state: GroupState[MgState]) =>
          val prev = state.getOption
          val buf = scala.collection.mutable.HashMap.from(
            prev.map(_.entries.map(e => e.tok -> e.n)).getOrElse(Seq.empty))
          var seen = prev.map(_.nSeen).getOrElse(0L)
          rows.foreach { r => agg.reduce(buf, r.tok); seen += 1 }
          val sorted = buf.toSeq.sortBy { case (t, n) => (-n, t) }
          state.update(MgState(
            sorted.map { case (t, n) => MgEntry(t, n) }, seen))
          sorted.take(topK).zipWithIndex.map { case ((t, n), i) =>
            MgTop(grp, t, n, i + 1, seen)
          }.iterator
      }.toDF()
  }

  final case class KmvRow(grp: String, h: Long)
  final case class KmvState(mins: Seq[Long])
  final case class KmvOut(grp: String, approx_distinct: Double, n_seen: Long)

  /** Streaming distinct-count: the incremental form of
    * Sketches.kmvDistinct / the native [[graft.functions.KmvSketchAgg]]
    * — per group, the k smallest distinct hashes carried as stream
    * state (≤ k longs per group, forever), with the current estimate
    * emitted each micro-batch (Update mode). Because the
    * k-smallest-distinct SET is order-independent, the emission after
    * batch N is EXACTLY the batch-mode answer over the stream's first
    * N batches — asserted prefix-for-prefix in StreamingSpec; rounding
    * (HALF_UP, 2dp) matches Spark's `round` so the parity is
    * bit-for-bit. Null values are skipped like both batch forms.
    * Group keys are assumed a small closed set — no timeout evicts
    * them. */
  def kmvDistinctStream(spark: SparkSession, events: DataFrame,
      grpCol: String, valueCol: String, k: Int = 64): DataFrame = {
    import spark.implicits._
    events.select(col(grpCol).cast("string").as("grp"),
        graft.functions.GF.hash32(col(valueCol).cast("string")).as("h"))
      .filter(col("h").isNotNull).as[KmvRow]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[KmvState, KmvOut](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[KmvRow], state: GroupState[KmvState]) =>
          val buf = new graft.functions.KmvBuffer(k)
          state.getOption.foreach(_.mins.foreach(m => buf.mins.add(m)))
          rows.foreach(r => buf.insert(r.h))
          state.update(KmvState(
            scala.jdk.CollectionConverters.IteratorHasAsScala(
              buf.mins.iterator()).asScala.map(_.longValue).toSeq))
          val n = buf.mins.size
          // shared guarded estimator (kth_min <= 0 would otherwise
          // make BigDecimal(Infinity) throw and kill the stream)
          val est =
            if (n == 0) 0.0
            else graft.operators.Sketches.kmvEstimateJvm(n.toLong,
              buf.mins.last(), k)
          Iterator.single(KmvOut(grp, est, n.toLong))
      }.toDF()
  }

  final case class CmsRow(grp: String, h: Long)
  final case class CmsFreqState(counts: Seq[Long])
  final case class CmsFreqOut(grp: String, key: String, cms_est: Long,
      n_seen: Long)

  /** Streaming frequency watchlist: the incremental form of
    * Sketches.cmsAgg + cmsEstimate — per group, the depth × width
    * Count-Min counter matrix carried as stream state (FIXED size
    * forever, however large the vocabulary), with the current
    * estimate for every WATCHED key emitted each micro-batch (Update
    * mode), stamped with the running insert count. Counter matrices
    * are plain sums over inserts, so the emission after batch N is
    * EXACTLY the batch sketch over the stream's first N batches —
    * asserted prefix-for-prefix in StreamingSpec. One-sided like the
    * batch form: est ≥ true count always. Null values are skipped.
    * Group keys are assumed a small closed set — no timeout evicts
    * them. */
  def cmsFreqStream(spark: SparkSession, events: DataFrame,
      grpCol: String, valueCol: String, watch: Seq[String],
      depth: Int = 4, width: Int = 256): DataFrame = {
    import spark.implicits._
    // watch-key hashes resolved driver-side once (hash32Jvm is the
    // asserted bit-equal twin of the column hash)
    val watched = watch.map(w => w -> graft.functions.GF.hash32Jvm(w))
    events.select(col(grpCol).cast("string").as("grp"),
        graft.functions.GF.hash32(col(valueCol).cast("string")).as("h"))
      .filter(col("h").isNotNull).as[CmsRow]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[CmsFreqState, CmsFreqOut](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[CmsRow],
            state: GroupState[CmsFreqState]) =>
          val buf = new graft.functions.CmsBuffer(depth, width)
          state.getOption.foreach { s =>
            var i = 0
            while (i < buf.counts.length) {
              buf.counts(i) = s.counts(i); i += 1
            }
          }
          rows.foreach(r => buf.add(r.h))
          state.update(CmsFreqState(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              buf.counts.clone())))
          // row 0 sums every insert exactly once
          var n = 0L
          var j = 0
          while (j < width) { n += buf.counts(j); j += 1 }
          watched.iterator.map { case (w, h) =>
            val est = (0 until depth).map { i =>
              val u = (h * (2L * i + 1) + (101L * i + 17)) % 4294967311L
              buf.counts(i * width + (u % width).toInt)
            }.min
            CmsFreqOut(grp, w, est, n)
          }
      }.toDF()
  }

  final case class HdrRow(grp: String, v: Long)
  final case class HdrState(buckets: Seq[(Long, Long)])
  final case class HdrOut(grp: String, phi: Double, hdr_q: Long,
      n_seen: Long)

  /** Streaming quantile watch: the incremental form of
    * Sketches.hdrAgg + hdrQuantile — per group, the HDR bucket map
    * carried as stream state (bounded by 2^sBits · log₂(range)
    * however many rows flow), with the current φ-quantile estimates
    * emitted each micro-batch (Update mode), stamped with the running
    * insert count. Bucket maps are plain sums over inserts, so the
    * emission after batch N is EXACTLY the batch sketch over the
    * stream's first N batches — asserted prefix-for-prefix against
    * the batch Column path in StreamingSpec. Null measures are
    * skipped. Group keys are assumed a small closed set — no timeout
    * evicts them. */
  def hdrQuantileStream(spark: SparkSession, events: DataFrame,
      grpCol: String, measureCol: String, phis: Seq[Double],
      sBits: Int = 7): DataFrame = {
    import spark.implicits._
    require(phis.nonEmpty, "hdrQuantileStream: need at least one phi")
    events.select(col(grpCol).cast("string").as("grp"),
        col(measureCol).cast("long").as("v"))
      .filter(col("v").isNotNull).as[HdrRow]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[HdrState, HdrOut](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[HdrRow],
            state: GroupState[HdrState]) =>
          val buf = new graft.functions.HdrBuffer
          state.getOption.foreach(_.buckets.foreach { case (b, c) =>
            buf.counts.update(b, c)
          })
          rows.foreach(r =>
            buf.add(graft.functions.HdrBuckets.bucketOf(r.v, sBits)))
          val snapshot = buf.counts.toSeq
          state.update(HdrState(snapshot))
          val n = snapshot.iterator.map(_._2).sum
          phis.iterator.map { phi =>
            // the handler only fires with rows, so the sketch is never
            // empty here; .get keeps that invariant loud
            HdrOut(grp, phi,
              graft.operators.Sketches.hdrQuantileJvm(snapshot, phi,
                sBits).get, n)
          }
      }.toDF()
  }

  final case class PsiVal(grp: String, v: Double)
  final case class PsiState(counts: Seq[Long])
  final case class PsiOut(grp: String, psi: Double, n_cur: Long,
      n_bins_present: Long)

  /** Per-group reference histogram for [[psiDriftStream]], computed by
    * the SAME batch binning as Profiling.psiDrift (Profiling.histogram
    * over Profiling.rangeEdges) and collected driver-side — groups ×
    * bins longs, metadata scale. */
  def refHistogram(ref: DataFrame, valCol: String, grpCol: String,
      bins: Int): Map[String, (Double, Double, Seq[Long])] = {
    val edges = graft.operators.Profiling.rangeEdges(ref, valCol, grpCol)
    val loHi = edges.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val hist = graft.operators.Profiling
      .histogram(ref, valCol, grpCol, edges, bins)
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        val counts = Array.fill(bins)(0L)
        rows.foreach(r => counts(r.getLong(1).toInt) = r.getLong(2))
        g -> counts.toSeq
      }
    loHi.map { case (g, (lo, hi)) =>
      g -> (lo, hi, hist.getOrElse(g, Seq.fill(bins)(0L)))
    }
  }

  /** The PSI fold shared by the streaming guard and the batch gate:
    * smoothed (1e-6) contributions over bins where either side has
    * mass. Returns (psi, n_bins_present). */
  private[streaming] def psiOf(refCnt: Seq[Long],
      cur: Seq[Long]): (Double, Long) = {
    val tRef = refCnt.sum.toDouble
    val tCur = cur.sum.toDouble
    var psi = 0.0
    var present = 0L
    var b = 0
    while (b < refCnt.length) {
      if (refCnt(b) > 0 || cur(b) > 0) {
        val pR = math.max(refCnt(b) / tRef, 1e-6)
        val pC = math.max(cur(b) / tCur, 1e-6)
        psi += (pC - pR) * math.log(pC / pR)
        present += 1
      }
      b += 1
    }
    (psi, present)
  }

  /** PSI of ONE batch against a frozen reference histogram, per group:
    * the admission test of [[driftGatedLakeWriter]]. Binning is the
    * SAME shared Profiling.histogram the batch monitor uses (bins from
    * the reference's [lo, hi], floor/clamp identical), aggregated to
    * (group, bin) grain before the metadata-scale collect. A group the
    * reference has never seen maps to `None` — brand-new populations
    * are drift by definition, the caller decides. */
  def batchPsi(batch: DataFrame, valCol: String, grpCol: String,
      refHist: Map[String, (Double, Double, Seq[Long])],
      bins: Int = 10): Map[String, Option[Double]] = {
    val spark = batch.sparkSession
    import spark.implicits._
    val edges = refHist.toSeq.map { case (g, (lo, hi, _)) => (g, lo, hi) }
      .toDF(grpCol, "lo", "hi")
    // NULL metric values carry no position in the histogram: drop them
    // here rather than let a null bin NPE the fold below and kill the
    // whole ingest stream (one bad row in a messy crawl batch must not
    // take down the gate). Null-heavy batches still face the gate on
    // their non-null mass; a KNOWN group whose batch values are all
    // null yields no histogram rows and is simply absent from the
    // result (no current mass -> no drift evidence either way).
    val known = graft.operators.Profiling
      .histogram(batch.filter(col(valCol).isNotNull)
        .select(col(grpCol).cast("string").as(grpCol),
          col(valCol).cast("double").as(valCol)), valCol, grpCol, edges, bins)
      .collect().groupBy(_.getString(0))
      .map { case (g, rows) =>
        val counts = Array.fill(bins)(0L)
        rows.foreach(r => counts(r.getLong(1).toInt) = r.getLong(2))
        g -> Some(psiOf(refHist(g)._3, counts.toSeq)._1)
      }
    val newGroups = batch.select(col(grpCol).cast("string")).distinct()
      .collect().map(_.getString(0)).filterNot(refHist.contains)
    known ++ newGroups.map(_ -> None).toMap
  }

  /** Drift-gated lake ingestion: the composition of the PSI drift
    * monitor with CorpusLake.upsertBatch into one guarded streaming
    * sink. Every micro-batch must pass the frozen-reference PSI
    * admission test BEFORE it may enter the training corpus: a batch
    * with any group's PSI above `threshold` — or any group the
    * reference has never seen — is written whole to `quarantinePath`
    * (annotated with batch id, worst group and its PSI) for a human
    * decision, and the lake is left untouched; a passing batch merges
    * through the crash-safe computed-placement upsert. This is the
    * "don't train on a poisoned crawl" gate run at ingest time rather
    * than as a post-hoc audit.
    *
    * Scale shape: the gate is one (group, bin)-grain aggregation per
    * micro-batch (metadata-scale collect), the admit path inherits
    * upsertBatch's touched-shards-only cost. Returns a writer ready to
    * `.start()`; checkpointing is the caller's choice. */
  def driftGatedLakeWriter(stream: DataFrame, lakePath: String,
      quarantinePath: String, idCol: String, valCol: String,
      grpCol: String, refHist: Map[String, (Double, Double, Seq[Long])],
      bins: Int = 10, threshold: Double = 0.25)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val psi = batchPsi(batch, valCol, grpCol, refHist, bins)
          // worst offender: unseen groups outrank any finite PSI
          val worst = psi.toSeq
            .sortBy { case (g, p) => (-p.getOrElse(Double.MaxValue), g) }
            .headOption
          val drifted = worst.exists { case (_, p) =>
            p.forall(_ > threshold) }
          if (drifted) {
            val (wg, wp) = worst.get
            batch.withColumn("batch_id", lit(batchId))
              .withColumn("drift_group", lit(wg))
              .withColumn("drift_psi",
                wp.map(lit).getOrElse(lit(null).cast("double")))
              .write.mode("append").parquet(quarantinePath)
          } else {
            graft.CorpusLake.upsertBatch(batch.sparkSession, lakePath,
              idCol, batch)
          }
        }
        ()
    }
  }

  /** Streaming corpus ingestion deduplicated against the PERSISTED
    * signature index (Dedup.writeSignatureIndex): every micro-batch
    * probes the index (band-partition-pruned bucket collisions), novel
    * docs append to `outPath` AND are upserted into the index so the
    * NEXT batch — and any concurrent batch pipeline — dedups against
    * them; duplicate docs land in `dupPath` with their corpus-hit
    * count for audit. The q81 incremental-dedup loop closed into a
    * continuously-running ingest: index state lives on disk (restart-
    * safe, shared across streams), not in executor memory — the
    * complement of [[dedupStream]]'s in-memory digest-TTL state, for
    * when "seen before" must mean the WHOLE historical corpus, not a
    * retention window.
    *
    * Scale shape per batch: the batch (small side) minhashes itself and
    * probes via the broadcast-batch join; the upsert appends
    * bucket-sorted files without touching existing postings
    * ([[graft.operators.Dedup.upsertSignatureIndex]]);
    * [[graft.operators.Dedup.compactSignatureIndex]] restores
    * one-file-per-band during maintenance windows. */
  def indexDedupWriter(stream: DataFrame, indexPath: String,
      outPath: String, dupPath: String, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 4, shingleN: Int = 3,
      maxBucketSize: Int = graft.operators.Dedup.DefaultMaxBucketSize)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // Probe at ROW grain through a composite (id, content-digest)
          // key: ids are NOT unique within a crawl micro-batch (replays,
          // reused ids carrying different content), and an id-grain
          // probe would either cross-product the joins below or damn a
          // reused id's novel content alongside its duplicate sibling.
          // Byte-identical (id, content) repeats collapse to one row.
          val b = batch
            .withColumn("__digest",
              md5(graft.operators.Dedup.normalizeText(col(textCol))))
            .withColumn("__key", concat_ws("#",
              col(idCol).cast("string"), col("__digest")))
            .dropDuplicates("__key")
            .graftCp(true) // one stable snapshot
          // capped probe (default on): duplicate rows carry n_hits +
          // hits_capped into dupPath, so a degenerate-signature surge
          // in the index shows up in the audit table per batch
          val verdicts = graft.operators.Dedup.dedupAgainstIndex(
            b, textCol, "__key", indexPath, k, bands, shingleN,
            maxBucketSize)
          // within-batch guard: the index only covers PRIOR batches, so
          // exact copies arriving together would all probe novel. Keep
          // the first copy per normalized-content digest; extras are
          // duplicates. (Within-batch NEAR-dups beyond exact copies are
          // next-batch/batch-pipeline territory.)
          val wd = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__digest")).orderBy(col("__key"))
          val flagged = b.join(verdicts, Seq("__key"))
            .withColumn("__rn", row_number().over(wd))
            .withColumn("is_dup", col("is_dup") || col("__rn") > 1)
            .drop("__rn")
            .withColumn("batch_id", lit(batchId))
            .graftCp(true) // settle BEFORE the index mutates
          flagged.filter(col("is_dup"))
            .drop("__digest", "__key")
            .write.mode("append").parquet(dupPath)
          val novel = flagged.filter(!col("is_dup"))
            .drop("n_hits", "is_dup", "hits_capped", "__digest", "__key")
          // out BEFORE index, deliberately: a crash between the two
          // leaves a doc in the corpus but not the index, so a future
          // copy may be admitted once more (duplicate — harmless, the
          // batch pipeline catches it). The reverse order would leave
          // content in the index but NOT in the corpus: every future
          // copy flagged as dup, the content lost forever.
          novel.write.mode("append").parquet(outPath)
          // skipExisting = false: the novel set is CONTENT-novel by the
          // probe, so its signatures must enter the index even when a
          // doc_id was seen before with different content — id-based
          // skipping would leave reused-id content permanently
          // unindexed (an unbounded dedup blind spot). Postings are a
          // bag, so extra rows per id are harmless.
          graft.operators.Dedup.upsertSignatureIndex(
            novel, textCol, idCol, indexPath, k, bands, shingleN,
            skipExisting = false)
        }
        ()
    }
  }

  /** Streaming distribution-drift guard: the incremental form of
    * Profiling.psiDrift. The reference histogram is frozen batch-side
    * ([[refHistogram]]) and rides the closure; stream state is ONE
    * bin-count vector per group (O(groups × bins) forever). Each
    * micro-batch folds its rows into the counts — the identical
    * floor/clamp arithmetic as the batch operator, so after any prefix
    * of the stream the emitted PSI equals the batch PSI of that prefix
    * (up to the batch side's 6-dp rounding; parity-tested). Emits
    * (grp, psi, n_cur, n_bins_present) per batch in Update mode —
    * the pre-retraining drift monitor running continuously instead of
    * as a pre-flight job. Groups absent from the reference emit
    * nothing (no edges to bin against). */
  def psiDriftStream(spark: SparkSession, stream: DataFrame,
      valCol: String, grpCol: String,
      refHist: Map[String, (Double, Double, Seq[Long])],
      bins: Int = 10): DataFrame = {
    import spark.implicits._
    stream.select(col(grpCol).cast("string").as("grp"),
        col(valCol).cast("double").as("v")).as[PsiVal]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[PsiState, PsiOut](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[PsiVal], state: GroupState[PsiState]) =>
          refHist.get(grp) match {
            case None => rows.foreach(_ => ()); Iterator.empty
            case Some((lo, hi, refCnt)) =>
              val counts = state.getOption.map(_.counts.toArray)
                .getOrElse(Array.fill(bins)(0L))
              val width = (hi - lo) / bins
              rows.foreach { r =>
                val b = if (hi == lo) 0
                  else math.min(bins - 1L, math.max(0L,
                    math.floor((r.v - lo) / width).toLong)).toInt
                counts(b) += 1
              }
              state.update(PsiState(counts.toSeq))
              val (psi, present) = psiOf(refCnt, counts.toSeq)
              Iterator.single(PsiOut(grp, psi, counts.sum, present))
          }
      }.toDF()
  }

  final case class FunRow(user_id: Long, event_type: String, us: Long)
  final case class FunnelState(stage: Int, tPrev: Long)
  final case class FunnelAdv(user_id: Long, step: Int,
      event_type: String, us: Long, lag_us: Option[Long])

  /** Live ordered funnel: the incremental form of
    * EventAnalytics.funnel. State per user is (stages completed, time
    * of last completion) — two numbers, O(users) total. Each
    * micro-batch folds the user's events IN TIMESTAMP ORDER (the batch
    * slice is sorted before folding, so intra-batch disorder is
    * harmless) and emits one advancement row per step the user
    * completes, with the same strictly-after / first-qualifying
    * semantics as batch. A step-k event that arrives in a LATER batch
    * than a step-(k+1) event (cross-batch disorder) is not replayed —
    * batch q77 over the full log remains the authority, the stream is
    * the monitor. Downstream per-step counts are one aggregation over
    * the advancement rows. */
  def funnelStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String], userCol: String = "user_id",
      usCol: String = "us", typeCol: String = "event_type"): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepArr = steps.toIndexedSeq
    events.select(col(userCol).cast("long").as("user_id"),
        col(typeCol).cast("string").as("event_type"),
        col(usCol).cast("long").as("us")).as[FunRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdv](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunRow], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[FunnelAdv]
          rows.toSeq.sortBy(r => (r.us, r.event_type)).foreach { r =>
            if (st.stage < stepArr.length &&
                r.event_type == stepArr(st.stage) &&
                (st.stage == 0 || r.us > st.tPrev)) {
              out += FunnelAdv(uid, st.stage + 1, r.event_type, r.us,
                if (st.stage == 0) None else Some(r.us - st.tPrev))
              st = FunnelState(st.stage + 1, r.us)
            }
          }
          state.update(st)
          out.result().iterator
      }.toDF()
  }
}
