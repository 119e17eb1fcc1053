package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamSessionize
import graft.streaming.StreamSessionize.Ev

/** End-to-end Structured Streaming: MemoryStream → watermark → windowed
  * agg / stateful sessionizer → memory sink (SURVEY.md §2.6 #47). */
class StreamingSpec extends SparkSpecBase {

  // offset from epoch 0: an event exactly AT the initial watermark (t=0)
  // is dropped by the stateful operator's late-data predicate (ts <= wm)
  private val Base = 1020L // hour-aligned (17:00) so windowed events share one hour
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60 * 1000)

  test("stateful 30-min-gap sessionizer emits sessions as the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamSessionize.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session); user 2: one event
      ms.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(5), 2.0), Ev(2L, ts(1), 5.0))
      q.processAllAvailable()
      // push event-time far ahead → watermark passes both session gaps
      ms.addData(Ev(1L, ts(240), 9.0))
      q.processAllAvailable()
      ms.addData(Ev(1L, ts(480), 9.0)) // one more batch so timeouts fire
      q.processAllAvailable()
      val out = spark.table("sessions").as[StreamSessionize.SessionOut].collect()
        .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events, s.sum_value)).toSet
      assert(out.contains((1L, ts(0).getTime, ts(5).getTime, 2L, 3.0)),
        s"user 1's first session missing from $out")
      assert(out.contains((2L, ts(1).getTime, ts(1).getTime, 1L, 5.0)),
        s"user 2's session missing from $out")
    } finally q.stop()
  }

  test("streaming funnel completes in order, ignores out-of-order stages, times out partials") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[StreamSessionize.FunnelEv]
    val q = StreamSessionize.funnel(ms.toDS())
      .writeStream.format("memory").queryName("funnels").outputMode("append").start()
    try {
      import StreamSessionize.FunnelEv
      ms.addData(
        // user 1: clean view -> click -> purchase
        FunnelEv(1L, ts(0), "view"), FunnelEv(1L, ts(2), "click"), FunnelEv(1L, ts(4), "purchase"),
        // user 2: purchase BEFORE any view/click must not complete
        FunnelEv(2L, ts(0), "purchase"), FunnelEv(2L, ts(1), "view"),
        // user 3: view then click, never purchases -> partial on timeout
        FunnelEv(3L, ts(0), "view"), FunnelEv(3L, ts(1), "click"))
      q.processAllAvailable()
      // advance event time far past user 2/3's inactivity timeout
      ms.addData(FunnelEv(9L, ts(300), "view"))
      q.processAllAvailable()
      ms.addData(FunnelEv(9L, ts(600), "view")) // one more batch so timeouts fire
      q.processAllAvailable()
      val out = spark.table("funnels").as[StreamSessionize.FunnelOut].collect()
        .map(f => f.user_id -> ((f.viewed, f.clicked, f.purchased, f.ms_to_complete))).toMap
      assert(out(1L) == ((true, true, true, 4L * 60 * 1000)), s"user 1: ${out.get(1L)}")
      assert(out(2L) == ((true, false, false, -1L)), s"user 2: ${out.get(2L)}")
      assert(out(3L) == ((true, true, false, -1L)), s"user 3: ${out.get(3L)}")
    } finally q.stop()
  }

  test("streaming near-dup: a close variant keeps few fresh bands, novel text keeps all") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = (1 to 80).map(i => f"token$i%03d").mkString(" ")
    val nearDup = base + " tail variation only"
    val novel = (1 to 80).map(i => f"other$i%03d").mkString(" ")
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = StreamSessionize.nearDupStream(
        ms.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("near_dup").outputMode("append").start()
    try {
      ms.addData((1L, ts(0), base))
      q.processAllAvailable() // doc 1 claims its bands first
      ms.addData((2L, ts(1), nearDup), (3L, ts(2), novel))
      q.processAllAvailable()
      ms.addData((9L, ts(240), "advance watermark"))
      q.processAllAvailable()
      ms.addData((9L, ts(480), "advance more"))
      q.processAllAvailable()
      val out = spark.table("near_dup")
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(out(1L) === 16L, s"first doc keeps all bands: $out")
      assert(out(3L) === 16L, s"novel doc keeps all bands: $out")
      assert(out(2L) <= 8L, s"near-dup must lose most bands: $out")
    } finally q.stop()
  }

  test("streaming PSI monitor flags drifted windows against the static baseline") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // uniform 10-bin baseline over [0, 10)
    val baseline = Seq(("a", 0.0, 10.0)).toDF("event_type", "vmn", "vmx")
      .select(col("event_type") +: col("vmn") +: col("vmx") +:
        (0 until 10).map(i => lit(0.1).as(s"q$i")): _*)
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = StreamSessionize.psiMonitor(
        ms.toDF().toDF("ts", "event_type", "value"), baseline)
      .writeStream.format("memory").queryName("psi_mon").outputMode("append").start()
    try {
      // window 1: one value per bin — exactly the baseline mix → PSI 0
      ms.addData((0 until 10).map(i => (ts(i.toLong), "a", i + 0.5)): _*)
      // window 2 (next hour): all mass in bin 0 → large PSI
      ms.addData((0 until 10).map(i => (ts(60 + i.toLong), "a", 0.5)): _*)
      q.processAllAvailable()
      ms.addData((ts(240), "a", 5.0)) // advance watermark past both windows
      q.processAllAvailable()
      ms.addData((ts(480), "a", 5.0))
      q.processAllAvailable()
      val out = spark.table("psi_mon")
        .collect().map(r => r.getTimestamp(0).getTime -> r.getDouble(3)).toMap
      val w1 = Base * 60 * 1000
      val w2 = (Base + 60) * 60 * 1000
      assert(out.contains(w1) && math.abs(out(w1)) < 1e-9,
        s"baseline-mix window must score ~0 PSI: $out")
      assert(out.contains(w2) && out(w2) > 1.0,
        s"drifted window must score large PSI: $out")
    } finally q.stop()
  }

  test("streaming DAU dedups repeat users within the day then counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val q = StreamSessionize.activeUsersStream(ms.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("dau").outputMode("append").start()
    try {
      // day 1: users 1, 1, 2 (user 1 twice — must count once)
      ms.addData((ts(0), 1L), (ts(30), 1L), (ts(90), 2L))
      q.processAllAvailable()
      // push event-time two days ahead → watermark closes day 1
      ms.addData((ts(60 * 24 * 2), 9L))
      q.processAllAvailable()
      ms.addData((ts(60 * 24 * 4), 9L))
      q.processAllAvailable()
      val out = spark.table("dau").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      assert(out.values.toSeq.contains(2L),
        s"day-1 DAU must be 2 (user 1 deduped): $out")
      assert(!out.values.exists(_ > 2L), s"no day can exceed 2 actives: $out")
    } finally q.stop()
  }

  test("streaming trending items surface the window's dominant item") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, String)]
    val q = StreamSessionize.trendingItems(
        ms.toDF().toDF("ts", "event_type", "props"), k = 3)
      .writeStream.format("memory").queryName("trending").outputMode("append").start()
    try {
      // window 1: item click:7 dominates (4 of 6 events)
      ms.addData(
        (ts(0), "click", "{\"k\": 7}"), (ts(1), "click", "{\"k\": 7}"),
        (ts(2), "click", "{\"k\": 7}"), (ts(3), "click", "{\"k\": 7}"),
        (ts(4), "view", "{\"k\": 1}"), (ts(5), "view", "{\"k\": 2}"))
      q.processAllAvailable()
      ms.addData((ts(240), "view", "{\"k\": 9}")) // advance watermark
      q.processAllAvailable()
      ms.addData((ts(480), "view", "{\"k\": 9}"))
      q.processAllAvailable()
      val rows = spark.table("trending").collect()
      assert(rows.nonEmpty, "no finalized trending window")
      val top = rows.map(_.getSeq[org.apache.spark.sql.Row](1))
        .find(_.exists(_.getString(0) == "click:7"))
      assert(top.isDefined, s"dominant item missing: ${rows.mkString(";")}")
      val entry = top.get.find(_.getString(0) == "click:7").get
      assert(entry.getLong(1) >= 4L, s"dominant count under-estimated: $entry")
    } finally q.stop()
  }

  test("watermark eviction BOUNDS streaming state across an out-of-order replay") {
    // The §5 claim "state is bounded by construction" asserted, not
    // narrated (r6 verdict item 8): replay 10 days × 40 users through
    // the two chained stateful operators of activeUsersStream
    // (dedup-within-watermark + windowed count) with the watermark
    // advancing day by day, and read the state-store row counts off
    // StreamingQueryProgress. Unbounded state would accumulate
    // ~400 dedup rows; the 25 h watermark must hold the TOTAL across
    // both operators near two days' worth.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val q = StreamSessionize.activeUsersStream(ms.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("dau_bound").outputMode("append").start()
    try {
      val users = 40L
      for (day <- 0 until 10) {
        // out-of-order inside each day: late stragglers first
        val evs = (0L until users).map { u =>
          (ts(day * 24 * 60 + (users - u) * 3), u)
        }
        ms.addData(evs: _*)
        q.processAllAvailable()
      }
      // the bound must hold at EVERY observed micro-batch, not just the
      // final one — take the max total across the whole replay
      val totals = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(p => p.stateOperators.map(_.numRowsTotal).sum)
      val total = totals.max
      val perOp = q.recentProgress.reverse.find(_.stateOperators.nonEmpty).get
        .stateOperators.map(so => so.operatorName -> so.numRowsTotal)
      info(s"max state rows over replay: $total; final by operator: ${perOp.mkString(", ")}")
      // 10 days × 40 users flowed through; watermark-bounded state may
      // hold the open day + the 25 h horizon, and eviction runs a
      // micro-batch behind the watermark — 5 days' worth is the loud
      // ceiling, half the ≥400 an unbounded dedup store would hold by
      // day 10. The FINAL dedup state legitimately holds the 25 h
      // horizon (+1 batch of eviction lag) ≈ 2-3 days of (user, day)
      // keys — ~120 here. (The r10 version of this test asserted final
      // ≤ users+10, which only ever held because the window-struct-
      // keyed dedup's TTL misfired and dumped ALL state every batch —
      // the very bug that silently double-counted DAU; the r11
      // streaming-replay lane caught it, StreamSessionize.scala:50.)
      assert(total <= users * 5,
        s"streaming state grew past the watermark bound: $total rows")
      assert(perOp.map(_._2).sum <= users * 3 + 10,
        s"final state failed to evict: ${perOp.mkString(", ")}")
      // and the pipeline still produced the correct closed-day counts
      val out = spark.table("dau_bound").collect().map(_.getLong(1))
      assert(out.nonEmpty && out.forall(_ == users),
        s"closed days must each count $users actives: ${out.mkString(",")}")
    } finally q.stop()
  }

  test("streaming category-drift monitor flags a flipped mix with exact in-stream shares") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // baseline mix: clicks dominate 80/20
    val baseline = Seq(("click", 0.8), ("view", 0.2)).toDF("event_type", "base_share")
    val ms = MemoryStream[(Timestamp, String)]
    val q = StreamSessionize.categoryDriftMonitor(
        ms.toDF().toDF("ts", "event_type"), baseline)
      .writeStream.format("memory").queryName("catdrift").outputMode("append").start()
    try {
      // window 1: mix flipped — 2 clicks, 8 views
      val evs = (1 to 2).map(i => (ts(i), "click")) ++ (1 to 8).map(i => (ts(10 + i), "view"))
      ms.addData(evs: _*)
      q.processAllAvailable()
      // window 2 (4 h later): one NOVEL type, clicks/views VANISH
      ms.addData((ts(240), "novel"))
      q.processAllAvailable()
      ms.addData((ts(480), "view")) // advance watermark, close window 1+2
      q.processAllAvailable()
      ms.addData((ts(720), "view")) // chained ops finalize a batch behind
      q.processAllAvailable()
      def win(at: Long) = spark.table("catdrift").collect()
        .filter(_.getTimestamp(0).getTime == ts(at).getTime)
        .map(r => r.getString(1) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4),
            if (r.isNullAt(5)) None else Some(r.getDouble(5)),
            if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
      val rows = win(0)
      assert(rows.contains("view") && rows.contains("click"), s"missing types: $rows")
      val (nV, totV, shareV, _, psiV) = rows("view")
      assert(nV == 8 && totV == 10, s"view counts wrong: ${rows("view")}")
      assert(math.abs(shareV - 9.0 / 12.0) < 1e-6, s"share not the exact smoothed 9/12: $shareV")
      assert(psiV.exists(_ > 0.5), s"flipped mix must light up the view contribution: $psiV")
      // window 2: the two canonical categorical-drift events. A
      // vanished baseline type still yields a smoothed n=0 row (k=3
      // union types, share (0+1)/(1+3)); a novel type surfaces with a
      // null base_share / psi instead of being inner-join-dropped.
      val w2 = win(240)
      assert(w2.keySet == Set("click", "view", "novel"), s"union mix incomplete: $w2")
      val (nC, totC, shareC, baseC, psiC) = w2("click")
      assert(nC == 0 && totC == 1, s"vanished type counts wrong: ${w2("click")}")
      assert(math.abs(shareC - 0.25) < 1e-6, s"vanished share not smoothed 1/4: $shareC")
      assert(baseC.contains(0.8) && psiC.exists(_ > 0.3),
        s"vanished dominant type must light up: ${w2("click")}")
      val (nN, _, _, baseN, psiN) = w2("novel")
      assert(nN == 1 && baseN.isEmpty && psiN.isEmpty,
        s"novel type must surface with null base_share/psi: ${w2("novel")}")
      // state is watermark-bounded across both chained aggregations
      val maxState = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).max
      assert(maxState <= 20, s"drift-monitor state grew past the horizon: $maxState")
    } finally q.stop()
  }

  test("funnel state stays bounded by the event-time timeout across a 10-day replay") {
    // r7 verdict item 7: the flatMapGroupsWithState funnel gets the
    // same 10-day out-of-order state-bound assertion the sessionizer
    // and DAU have. 40 users open a funnel (view, no purchase) every
    // day; the 1 h inactivity timeout must evict each day's partials
    // as the watermark passes, so state never approaches the 400
    // open-funnel rows an unbounded store would hold.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StreamSessionize.FunnelEv
    val ms = MemoryStream[FunnelEv]
    val q = StreamSessionize.funnel(ms.toDS())
      .writeStream.format("memory").queryName("funnel_bound").outputMode("append").start()
    try {
      val users = 40L
      for (day <- 0 until 10) {
        // out-of-order inside each day: late users first
        val evs = (0L until users).map { u =>
          FunnelEv(u, ts(day * 24 * 60 + (users - u) * 3), "view")
        }
        ms.addData(evs: _*)
        q.processAllAvailable()
      }
      val totals = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      val maxState = totals.max
      info(s"max funnel state rows over replay: $maxState")
      assert(maxState <= users * 3,
        s"funnel state grew past the timeout horizon: $maxState rows")
      // and the timed-out partials actually came out as view-only rows
      val outs = spark.table("funnel_bound").as[StreamSessionize.FunnelOut].collect()
      assert(outs.nonEmpty && outs.forall(o => o.viewed && !o.purchased),
        s"timed-out partials wrong: ${outs.take(3).mkString(",")}")
    } finally q.stop()
  }

  test("trending-items window state stays bounded by the watermark across a 10-day replay") {
    // r7 verdict item 7, trendingItems half: 24 ten-minute windows per
    // day × 10 days flow through; the 1 h watermark must keep the
    // windowed heavy-hitter state near the horizon (each state row is
    // one window's O(k) Misra-Gries heap), nowhere near the 240
    // windows an unbounded store would hold.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, String)]
    val q = StreamSessionize.trendingItems(
        ms.toDF().toDF("ts", "event_type", "props"), k = 3)
      .writeStream.format("memory").queryName("trending_bound").outputMode("append").start()
    try {
      for (day <- 0 until 10) {
        // one event per hour, stragglers first within the day
        val evs = (0 until 24).map { h =>
          (ts(day * 24 * 60 + (23 - h) * 60L), "click", s"""{"k": ${h % 5}}""")
        }
        ms.addData(evs: _*)
        q.processAllAvailable()
      }
      val totals = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      val maxState = totals.max
      info(s"max trending state rows over replay: $maxState")
      assert(maxState <= 60,
        s"trending window state grew past the watermark horizon: $maxState rows")
      assert(spark.table("trending_bound").count() >= 24 * 9,
        "closed windows were not finalized")
    } finally q.stop()
  }

  test("near-dup stream state stays bounded by the watermark across a long replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val q = StreamSessionize.nearDupStream(
        ms.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("ndstate").outputMode("append").start()
    try {
      // 8 hours × 6 distinct docs/hour, each exploding into 16 band
      // keys: unbounded dedup state would hold ~768 band rows by the
      // end; the 1 h watermark must keep it near two horizons' worth
      for (h <- 0 until 8) {
        val docs = (0 until 6).map { i =>
          (ts(h * 60L + i * 7), (h * 10 + i).toLong,
            s"doc $h $i " + ("unique text block " * 3) + s"tail $h $i")
        }
        ms.addData(docs: _*)
        q.processAllAvailable()
      }
      val totals = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      val maxState = totals.max
      assert(maxState < 400,
        s"near-dup state grew past the watermark horizon: $maxState")
      assert(spark.table("ndstate").count() > 0)
    } finally q.stop()
  }

  test("native topk_by aggregate partial-merges inside a streaming windowed agg") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val agg = ms.toDF().toDF("ts", "id", "score")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.VectorFunctions.topKByScore(col("score"), col("id"), 2).as("tk"))
    val q = agg.writeStream.format("memory").queryName("stream_topk")
      .outputMode("complete").start()
    try {
      ms.addData((ts(0), 1L, 1.0), (ts(1), 2L, 5.0))
      q.processAllAvailable()
      // second micro-batch merges into the SAME window's heap state
      ms.addData((ts(2), 3L, 3.0), (ts(3), 4L, 0.5))
      q.processAllAvailable()
      val ids = spark.table("stream_topk")
        .selectExpr("explode(tk.id) AS id").as[Long].collect().toSet
      assert(ids == Set(2L, 3L), s"expected top-2 ids {2,3}, got $ids")
    } finally q.stop()
  }

  test("sessionizer merges an out-of-order event and lowers the session start") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamSessionize.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("sessions_ooo").outputMode("append").start()
    try {
      ms.addData(Ev(7L, ts(60), 1.0))
      q.processAllAvailable()
      // out-of-order: 5 minutes EARLIER than the open session's start,
      // still above the watermark — must extend the session backwards
      ms.addData(Ev(7L, ts(55), 2.0))
      q.processAllAvailable()
      ms.addData(Ev(7L, ts(600), 0.0)) // push watermark far ahead
      q.processAllAvailable()
      ms.addData(Ev(7L, ts(1200), 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions_ooo").as[StreamSessionize.SessionOut].collect()
        .map(s => (s.start_ms, s.end_ms, s.n_events, s.sum_value)).toSet
      assert(out.contains((ts(55).getTime, ts(60).getTime, 2L, 3.0)),
        s"out-of-order event not merged with correct start: $out")
    } finally q.stop()
  }

  test("streaming dedup drops repeated normalized text within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val docs = ms.toDF().toDF("ts", "doc_id", "text")
    val q = StreamSessionize.dedupStream(docs)
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      ms.addData(
        (ts(0), 1L, "Hello   world"),
        (ts(1), 2L, "hello world"),   // same after normalization → dropped
        (ts(2), 3L, "something else"))
      q.processAllAvailable()
      ms.addData((ts(5), 4L, "HELLO  world")) // still within horizon → dropped
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L), s"kept=$kept")
    } finally q.stop()
  }

  test("streaming ingest filter joins static priors and gates on quality") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val priors = Seq(("good_src", 1.0), ("bad_src", 0.0)).toDF("source", "source_weight")
    val ms = MemoryStream[(Long, String, String)]
    val docs = ms.toDF().toDF("doc_id", "source", "text")
    val q = StreamSessionize.ingestFilter(docs, priors)
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    try {
      ms.addData(
        (1L, "good_src", "a clean document with plenty of ordinary words in its body text"),
        (2L, "good_src", "short"),                                   // < 10 tokens
        (3L, "bad_src",  "a clean document with plenty of ordinary words in its body text"),
        (4L, "new_src",  "an unlisted source keeps its default weight and passes the gate fine"),
        (5L, "good_src", "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16")) // digit soup
      q.processAllAvailable()
      val kept = spark.table("ingest").filter($"keep").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 4L), s"kept=$kept")
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks in the preceding hour") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val cDf = clicks.toDF().toDF("user_id", "ts", "value")
    val pDf = purchases.toDF().toDF("event_id", "user_id", "ts")
    val q = StreamSessionize.clickAttribution(cDf, pDf)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), 1.5), (1L, ts(30), 2.5), (2L, ts(10), 9.0))
      purchases.addData((100L, 1L, ts(45))) // clicks @0 and @30 in window
      q.processAllAvailable()
      clicks.addData((1L, ts(170), 0.0))     // advance click watermark
      purchases.addData((101L, 1L, ts(240))) // nearest click 70 min back → outside the hour
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("event_id", "c_val").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((100L, 1.5), (100L, 2.5)), s"got $rows")
    } finally q.stop()
  }

  test("watermarked tumbling-window aggregate finalizes closed windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val events = ms.toDF().toDF("ts", "event_type", "value")
    val q = StreamSessionize.windowedCounts(events)
      .writeStream.format("memory").queryName("windowed").outputMode("append").start()
    try {
      ms.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0), (ts(40), "view", 3.0))
      q.processAllAvailable()
      ms.addData((ts(300), "click", 0.0)) // advance watermark past hour 0
      q.processAllAvailable()
      ms.addData((ts(600), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("windowed")
        .selectExpr("window_start", "event_type", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val hourStart = Base * 60 * 1000
      assert(rows.contains((hourStart, "click", 2L, 3.0)), s"first-hour click window wrong: $rows")
      assert(rows.contains((hourStart, "view", 1L, 3.0)), s"first-hour view window wrong: $rows")
    } finally q.stop()
  }

  test("stream_funnel_replay golden fixture: full sf0.01 output hash is frozen") {
    // r12 verdict item 6 (the text_compression precedent): the replay
    // lane's event-time-ordered micro-batches + far-future sentinel
    // batches make the flatMapGroupsWithState funnel tracker's output
    // DETERMINISTIC — every completion emits inline in event order and
    // every partial times out exactly once — even though the per-user
    // automaton has no SQL twin (why the gate entry is declared
    // rows-only). Pin the full sf0.01 completion/timeout table with a
    // SHA-256 over a canonical sorted text form so semantic drift fails
    // a spec instead of nothing. Regenerate the constant deliberately
    // (diff per-row output first), never to silence a surprise.
    val golden = "103c8eb67fd77e775fa2871f66d2f2b3963cdf564d7362bd6070d58fd9c26273"
    val rows = graft.streaming.StreamReplay.queries("stream_funnel_replay")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "funnel replay emitted nothing at sf0.01")
    val canon = rows.map { r =>
      s"${r.getAs[Long]("user_id")}|${r.getAs[Boolean]("viewed")}|" +
        s"${r.getAs[Boolean]("clicked")}|${r.getAs[Boolean]("purchased")}|" +
        s"${r.getAs[Long]("ms_to_complete")}"
    }.sorted.mkString("\n")
    val got = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == golden,
      s"stream_funnel_replay output drifted from the frozen fixture: got $got " +
        s"over ${rows.length} rows (first: ${canon.linesIterator.take(3).mkString("; ")})")
  }
}
