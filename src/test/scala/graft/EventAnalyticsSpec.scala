package graft

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L // seconds -> µs

  test("funnel: strictly-after ordering, first qualifying event, lags") {
    // user 1 converts fully; user 2's first click precedes its view (must
    // not count) but a later one qualifies; user 3 never clicks
    val ev = Seq(
      (1L, "view", 1L * S), (1L, "click", 3L * S), (1L, "purchase", 7L * S),
      (2L, "click", 4L * S), (2L, "view", 5L * S), (2L, "click", 6L * S),
      (3L, "view", 9L * S), (3L, "purchase", 10L * S))
      .toDF("user_id", "event_type", "us")
    val got = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2),
          Option(r.getAs[java.lang.Double]("avg_lag_sec"))))).toMap
    assert(got(1) == (("view", 3L, None)), got(1))
    // user 1 lag 2s, user 2 lag 1s -> avg 1.5s
    assert(got(2) == (("click", 2L, Some(1.5))), got(2))
    // user 3's purchase without a click must not count
    assert(got(3) == (("purchase", 1L, Some(4.0))), got(3))
  }

  test("funnel: empty later stage yields zero count and null lag") {
    val ev = Seq((1L, "view", 1L * S)).toDF("user_id", "event_type", "us")
    val got = EventAnalytics.funnel(ev, Seq("view", "click"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), r.isNullAt(3)))).toMap
    assert(got(1) == ((1L, true)))
    assert(got(2) == ((0L, true)))
  }

  test("funnelTiming: exact interpolated percentiles of per-user lag") {
    // four converting users with click lags 1s, 2s, 3s, 10s
    val ev = (1L to 4L).flatMap { u =>
      val lag = if (u == 4) 10L else u
      Seq((u, "view", u * 100L * S), (u, "click", (u * 100L + lag) * S))
    }.toDF("user_id", "event_type", "us")
    val r = EventAnalytics.funnelTiming(ev, Seq("view", "click"))
      .collect().head
    assert(r.getInt(0) == 2 && r.getString(1) == "click")
    assert(r.getLong(2) == 4L)
    // quantile_cont over [1,2,3,10]: p50 = 2.5, p90 = 3 + 0.7*7 = 7.9
    assert(r.getDouble(3) == 2.5, s"p50 ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 7.9) < 1e-9, s"p90 ${r.getDouble(4)}")
    assert(r.getDouble(5) == 10.0)
  }

  test("retentionCohorts: cohort from first event, offsets per active week") {
    val wk = 7L * 86400L * S
    val ev = Seq(
      (1L, 0L * wk), (1L, 1L * wk + 5), (1L, 3L * wk),
      (2L, 1L * wk), (2L, 2L * wk + 9))
      .toDF("user_id", "us")
    val got = EventAnalytics.retentionCohorts(ev)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)), got)
  }

  test("botScore: scripted cadence flagged, organic and sparse users not") {
    // user 1: 30 events 100ms apart (bot); user 2: 30 events 60s apart
    // (organic); user 3: 3 events 50ms apart (too few to call)
    val ev = ((0 until 30).map(i => (1L, 100L + i.toLong, i * 100000L)) ++
      (0 until 30).map(i => (2L, 200L + i.toLong, i * 60000000L)) ++
      (0 until 3).map(i => (3L, 300L + i.toLong, i * 50000L)))
      .toDF("user_id", "event_id", "us")
    val got = EventAnalytics.botScore(ev, minEvents = 20L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("is_bot"))
    assert(got(1L).getAs[Double]("median_gap_us") == 100000.0)
    assert(got(1L).getAs[Double]("fast_frac") == 1.0)
    assert(!got(2L).getAs[Boolean]("is_bot"))
    assert(got(2L).getAs[Double]("fast_frac") == 0.0)
    assert(!got(3L).getAs[Boolean]("is_bot"),
      "3 fast events alone must not convict")
  }

  test("validityIntervals: runs collapse, half-open windows chain, ties break by id") {
    // user 1: A A B B A -> intervals A[10,30) B[30,50) A[50,null);
    // user 2: single observation -> one open interval;
    // same-ts tie (40a/41b at ts 50 for user 3) ordered by event_id
    val ev = Seq(
      (1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"), (1L, 30L, 102L, "B"),
      (1L, 40L, 103L, "B"), (1L, 50L, 104L, "A"),
      (2L, 5L, 200L, "X"),
      (3L, 50L, 300L, "P"), (3L, 50L, 301L, "Q"))
      .toDF("user_id", "us", "event_id", "state0")
    val iv = EventAnalytics.validityIntervals(ev, "user_id", "us",
        "event_id", "state0")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val u1 = iv.filter(_._1 == 1L).sortBy(_._3)
    assert(u1.toSeq == Seq((1L, "A", 10L, 30L), (1L, "B", 30L, 50L),
      (1L, "A", 50L, -1L)), u1.toSeq)
    assert(iv.filter(_._1 == 2L).toSeq == Seq((2L, "X", 5L, -1L)))
    // P (event 300) precedes Q (event 301) at the tied timestamp
    val u3 = iv.filter(_._1 == 3L).sortBy(_._2)
    assert(u3.toSeq == Seq((3L, "P", 50L, 50L), (3L, "Q", 50L, -1L)),
      u3.toSeq)
  }

  test("validityIntervals: a key whose FIRST observed state is null keeps its interval") {
    // null <=> lag(null-on-first-row) is true, so a bare change filter
    // silently dropped the leading interval; null→A and A→null are
    // still genuine transitions
    val ev = Seq(
      (1L, 10L, 100L, null.asInstanceOf[String]),
      (1L, 20L, 101L, null.asInstanceOf[String]), // run of nulls collapses
      (1L, 30L, 102L, "A"),
      (1L, 40L, 103L, null.asInstanceOf[String]))
      .toDF("user_id", "us", "event_id", "state0")
    val iv = EventAnalytics.validityIntervals(ev, "user_id", "us",
        "event_id", "state0")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "∅" else r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(_._3)
    assert(iv.toSeq == Seq((1L, "∅", 10L, 30L), (1L, "A", 30L, 40L),
      (1L, "∅", 40L, -1L)), iv.toSeq)
  }

  test("conversionAttribution: first vs last touch disagree; touchless purchase attributes to null") {
    val ev = Seq(
      (1L, 10L, 1L, "view", 0.0), (1L, 20L, 2L, "click", 0.0),
      (1L, 30L, 3L, "purchase", 5.0),   // first=view, last=click
      (2L, 10L, 4L, "purchase", 7.0))   // no prior touch -> null
      .toDF("user_id", "us", "event_id", "event_type", "value")
    val got = EventAnalytics.conversionAttribution(ev, "user_id", "us",
        "event_id", "event_type", "value", "purchase")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) "∅" else r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("first", "view")) == ((1L, 5.0)))
    assert(got(("last", "click")) == ((1L, 5.0)))
    assert(got(("first", "∅")) == ((1L, 7.0)) &&
      got(("last", "∅")) == ((1L, 7.0)), got.toString)
  }

  test("transitionMatrix: per-user adjacency, probabilities row-normalize to 1") {
    val ev = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (2L, 1L, 4L, "a"), (2L, 2L, 5L, "b"))
      .toDF("user_id", "us", "event_id", "event_type")
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "us",
        "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", "b")) == ((2L, 1.0)))   // a->b both users
    assert(got(("b", "a")) == ((1L, 1.0)))   // only user 1
    // no cross-user transition (user 1's trailing 'a' -> user 2's 'a')
    assert(!got.contains(("a", "a")))
  }
}
