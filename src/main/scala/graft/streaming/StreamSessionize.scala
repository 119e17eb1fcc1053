package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines (SURVEY.md §2.6 #47): watermarked
  * tumbling-window aggregates and a stateful 30-min-gap sessionizer —
  * the streaming twins of graft.core.Sessions. Exercised end-to-end in
  * StreamingSpec via MemoryStream; at scale these run unchanged on a
  * Kafka/files source with checkpointing.
  */
object StreamSessionize {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionAcc(start_ms: Long, end_ms: Long, n: Long, sum_value: Double)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long, sum_value: Double)

  /** Watermarked tumbling-window counts per event_type — pure
    * declarative streaming agg (incremental state handled by Spark). */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup — the streaming twin of dedup_exact: drop
    * documents whose normalized-text hash was already seen within the
    * watermark horizon. State is bounded by the horizon (Spark evicts
    * keys older than the watermark), which is what makes exact dedup
    * viable on an unbounded stream. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("norm_hash", md5(trim(regexp_replace(lower(col("text")), lit("\\s+"), lit(" ")))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("norm_hash")

  /** Streaming DAU — the streaming face of the #255 actives rollup:
    * exact per-day distinct users via watermark-bounded dedup on
    * (user, day window), then a windowed count — two chained stateful
    * operators, both state-bounded by the watermark horizon. WAU/MAU
    * stay batch rollups over the sink (the lambda split every actives
    * dashboard uses: trailing-30-day distinct state has no watermark-
    * bounded streaming form). */
  def activeUsersStream(events: DataFrame, watermark: String = "25 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      // the dedup KEY is a plain date_trunc column (NO event-time
      // metadata) while ts stays the stream's event-time column. The
      // r10 form keyed on a window() struct with ts projected away —
      // and dropDuplicatesWithinWatermark's state TTL read through the
      // struct misfires: state died at every micro-batch boundary, so
      // same-day duplicates arriving in the NEXT batch survived (the
      // r11 streaming-replay lane caught it: batch-boundary days
      // counted ~198 "distinct" users vs 136 truth at sf0.01). With a
      // real top-level event-time column the TTL is first-seen ts +
      // horizon, which outlives every same-day duplicate: exact DAU.
      .select(col("user_id"), col("ts"), date_trunc("day", col("ts")).as("day"))
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(col("window.start").as("day_start"), col("dau"))

  /** Streaming trending items: per tumbling 10-minute window, the
    * Misra-Gries heavy hitters of the (event_type, props.k) item
    * stream through the native ApproxHeavyHitters aggregate — ≤ k
    * counters per window partial on the exchange AND in the streaming
    * state store (the same mergeable-partial property that bounds the
    * batch exchange bounds incremental state). Append mode: each
    * window's top list finalizes when the watermark passes. */
  def trendingItems(events: DataFrame, k: Int = 5,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("item",
        concat(col("event_type"), lit(":"),
          get_json_object(col("props"), "$.k")))
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.functions.VectorFunctions
        .approxHeavyHitters(col("item"), k).as("top"))
      .select(col("window.start").as("window_start"), col("top"))

  /** Streaming ingest filter — the streaming front door of a training-
    * data pipeline: stateless per-doc quality signals (codegen'd
    * regex counts, no state) plus a stream-static broadcast join to
    * per-source priors. Emits every doc with its keep/drop decision.
    * Stream-static joins need no watermark (the static side is fixed
    * per micro-batch), so this composes freely with downstream
    * stateful stages. */
  def ingestFilter(docs: DataFrame, sourcePriors: DataFrame,
      minTokens: Int = 10, maxDigitRatio: Double = 0.3,
      minSourceWeight: Double = 0.2): DataFrame = {
    val len = length(col("text")).cast("double")
    val nWs = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("double")
    docs
      .withColumn("n_ws_tokens", nWs)
      .withColumn("digit_ratio",
        size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))) / len)
      .join(broadcast(sourcePriors), Seq("source"), "left")
      .withColumn("keep",
        col("n_ws_tokens") >= minTokens && col("digit_ratio") <= maxDigitRatio &&
          coalesce(col("source_weight"), lit(1.0)) >= minSourceWeight)
  }

  /** Watermarked stream-stream interval join: each purchase joins the
    * same user's clicks from the preceding hour. Both sides carry
    * event-time watermarks and the join predicate bounds the time
    * range, so Spark can evict join state as the watermarks advance —
    * the state-bounded shape that runs forever on an unbounded pair of
    * streams (the streaming twin of Sessions.rangeJoinClicks). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .selectExpr("user_id AS c_user", "ts AS c_ts", "value AS c_val")
      .withWatermark("c_ts", "2 hours")
    val p = purchases
      .selectExpr("event_id", "user_id AS p_user", "ts AS p_ts")
      .withWatermark("p_ts", "1 hour")
    p.join(c,
      expr("""c_user = p_user AND
              c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"""),
      "inner")
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"), col("c_val"))
  }

  /** Streaming PSI drift monitor — the streaming twin of
    * core.Scores.psiDrift: per tumbling window and event type, bin the
    * value stream against a STATIC baseline's bin edges and compare the
    * window's bin mix to the baseline proportions with the smoothed
    * PSI. Everything reduces to ONE streaming aggregation (bin counts
    * as 10 conditional-count columns, the cross-bin PSI combine is
    * plain post-agg column arithmetic), so it runs in append mode with
    * watermark-bounded state — the multi-aggregation formulation
    * Structured Streaming forbids is never needed.
    *
    * `baseline`: (event_type, vmn, vmx, q0..q9) — the reference
    * proportions, precomputed offline (e.g. by Analytics.psi's binning
    * over the training corpus) and broadcast to every micro-batch. */
  def psiMonitor(events: DataFrame, baseline: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val nBins = 10
    val binned = events
      .withWatermark("ts", watermark)
      .join(broadcast(baseline.select(col("event_type"), col("vmn"), col("vmx"))),
        Seq("event_type"))
      .withColumn("__bin", when(col("vmx") > col("vmn"), least(lit(nBins - 1),
        floor((col("value") - col("vmn")) / (col("vmx") - col("vmn")) * nBins)
          .cast("int"))).otherwise(lit(0)))
    val counts = binned
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (0 until nBins).map(i =>
          count(when(col("__bin") === i, lit(1))).as(s"__c$i")): _*)
    val terms = (0 until nBins).map { i =>
      val p = (col(s"__c$i") + lit(0.5)) / (col("n") + lit(0.5 * nBins))
      val q = col(s"q$i")
      (p - q) * log(p / q)
    }
    counts
      .join(broadcast(baseline), Seq("event_type"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), terms.reduce(_ + _).as("psi"))
  }

  /** Streaming categorical-mix drift monitor — the stream twin of the
    * batch `category_drift` (#296) the way psiMonitor twins psi_drift:
    * per tumbling window, the event-TYPE mix against a static baseline
    * share table (event_type, base_share). TWO chained stateful
    * aggregations (the Spark 3.4+ multiple-stateful-operator path the
    * streaming-DAU pipeline also uses): (window, type) counts re-
    * aggregate per window into the full mix, so shares and PSI
    * contributions are EXACT within the stream — no sink-side math.
    *
    * The window mix is OUTER-completed against the baseline type set
    * (a |types|-bounded static table, embedded as a literal at plan
    * build): a type that VANISHES in a window still yields a smoothed
    * n=0 row (the loudest categorical-drift signal there is), and a
    * NOVEL type absent from the baseline is surfaced with a null
    * base_share / null psi_contrib instead of being dropped by an
    * inner join. Laplace k smooths over the UNION type set — matching
    * the batch twin, which smooths over the global set and surfaces
    * zero-count halves. Both states are watermark-bounded; per-window
    * output is |union types| rows whose psi_contrib (novel rows
    * excluded) sums to the drift index. */
  def categoryDriftMonitor(events: DataFrame, baseline: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val base = baseline
      .select(col("event_type").cast("string"), col("base_share").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val baseTypes = array(base.map(t => lit(t._1)).toIndexedSeq: _*)
    val baseShares = if (base.isEmpty) typedLit(Map.empty[String, Double])
      else map(base.flatMap(t => Seq(lit(t._1), lit(t._2))).toIndexedSeq: _*)
    val counts = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy(col("window"))
      .agg(sum(col("n")).as("total"),
        collect_list(struct(col("event_type"), col("n"))).as("mix"))
      // union type set: observed ∪ baseline — vanished types re-enter
      // with n=0 via the map lookup; k counts the union (batch parity)
      .withColumn("all_types",
        array_union(expr("transform(mix, e -> e.event_type)"), baseTypes))
      .withColumn("k", size(col("all_types")).cast("long"))
      .select(col("window.start").as("window_start"), col("total"), col("k"),
        explode(expr("transform(all_types, t -> struct(t AS event_type, " +
          "coalesce(element_at(map_from_entries(mix), t), 0L) AS n))")).as("e"))
      .select(col("window_start"), col("e.event_type").as("event_type"),
        col("e.n").as("n"), col("total"),
        ((col("e.n") + lit(1.0)) / (col("total") + col("k"))).as("share_raw"),
        element_at(baseShares, col("e.event_type")).as("base_share"))
      .select(col("window_start"), col("event_type"), col("n"), col("total"),
        round(col("share_raw"), 6).as("share"), col("base_share"),
        round((col("share_raw") - col("base_share"))
          * log(col("share_raw") / col("base_share")), 6).as("psi_contrib"))
  }

  /** Streaming NEAR-dup detection — the streaming twin of the batch
    * MinHash-LSH pipeline (graft.api.Similarity.nearDupPairsLsh):
    * every doc explodes into its 16 LSH band keys; a band key already
    * claimed inside the watermark horizon is dropped by
    * dropDuplicatesWithinWatermark, so a doc's surviving ("fresh")
    * band count measures its novelty — a near-duplicate of anything
    * seen in the horizon shares most bands and keeps few. Emits
    * (window_start, doc_id, fresh_bands); flag docs with fresh_bands ≤
    * `dupThreshold` as near-dups. Both stateful stages are
    * watermark-bounded (band-dedup state + windowed agg state), so
    * state never grows beyond the horizon — the property that makes
    * streaming near-dup viable at all. Exact-dup is a special case
    * (fresh_bands = 0). */
  def nearDupStream(docs: DataFrame, watermark: String = "1 hour",
      numBands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // 64-slot width rides the OPH signature (one SplitMix64 per shingle
    // instead of 64 — the r12 #337 lever, same swap as nearDupPairsLsh);
    // other widths keep the classic per-slot stream
    val sig =
      if (numBands * rowsPerBand == 64)
        graft.functions.VectorFunctions.ophMinhashSig(
          graft.functions.VectorFunctions.charShingles(
            graft.api.Similarity.normalizeText(col("text")), 5))
      else graft.functions.VectorFunctions.minhashSigText(
        // normalize on BOTH branches (r13 ADVICE: minhashSigText does
        // not normalize internally, so the classic widths silently
        // shingled raw text while the 64-slot OPH path normalized —
        // matching the batch twin nearDupPairsLsh requires it here too)
        graft.api.Similarity.normalizeText(col("text")), 5, numBands * rowsPerBand)
    val bands = docs
      .withColumn("__sig", sig)
      .select(col("doc_id"), col("ts"),
        posexplode(expr(s"transform(sequence(0, ${numBands - 1}), b -> " +
          s"xxhash64(b, slice(__sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
          .as(Seq("band", "band_hash")))
    bands
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("band", "band_hash")
      .groupBy(window(col("ts"), watermark), col("doc_id"))
      .agg(count(lit(1)).as("fresh_bands"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("fresh_bands"))
  }

  case class FunnelEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class FunnelAcc(t_view: Long, t_click: Long, t_purchase: Long, last_ms: Long)
  case class FunnelOut(user_id: Long, viewed: Boolean, clicked: Boolean,
    purchased: Boolean, ms_to_complete: Long)

  /** Stateful ordered-funnel tracker — the streaming twin of
    * Sessions.funnelConversion: per user, advance view → click →
    * purchase only when each stage happens at-or-after the previous
    * stage's first time. Emits a completed funnel immediately (state
    * resets for the next one) or the partial progress when the
    * event-time watermark passes the inactivity timeout. State is one
    * small record per active user, timeout-evicted — bounded forever. */
  def funnel(events: Dataset[FunnelEv],
      timeoutMs: Long = 60L * 60 * 1000): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelAcc, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[FunnelAcc]) =>
          if (state.hasTimedOut) {
            val a = state.get
            state.remove()
            Iterator(FunnelOut(userId, a.t_view >= 0, a.t_click >= 0, false, -1L))
          } else {
            var a = state.getOption.getOrElse(FunnelAcc(-1L, -1L, -1L, 0L))
            val out = Seq.newBuilder[FunnelOut]
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              a = a.copy(last_ms = math.max(a.last_ms, t))
              e.event_type match {
                case "view" if a.t_view < 0 => a = a.copy(t_view = t)
                case "click" if a.t_view >= 0 && a.t_click < 0 && t >= a.t_view =>
                  a = a.copy(t_click = t)
                case "purchase" if a.t_click >= 0 && t >= a.t_click =>
                  out += FunnelOut(userId, true, true, true, t - a.t_view)
                  a = FunnelAcc(-1L, -1L, -1L, t) // funnel complete: reset
                case _ => ()
              }
            }
            if (a.t_view >= 0) {
              state.update(a)
              state.setTimeoutTimestamp(a.last_ms + timeoutMs)
            } else if (state.exists) state.remove()
            out.result().iterator
          }
      }
  }

  /** Stateful gap sessionizer: one state record per user; a session is
    * emitted when the event-time watermark passes its gap timeout (or a
    * new event arrives beyond the gap). State size is O(active users).
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start_ms, s.end_ms, s.n, s.sum_value))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var acc = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              acc match {
                // within gap of the CURRENT session interval — including
                // out-of-order events that arrive before its start
                case Some(a) if t >= a.start_ms - gapMs && t <= a.end_ms + gapMs =>
                  acc = Some(a.copy(start_ms = math.min(a.start_ms, t),
                    end_ms = math.max(a.end_ms, t), n = a.n + 1,
                    sum_value = a.sum_value + e.value))
                case Some(a) if t > a.end_ms + gapMs =>
                  closed += SessionOut(userId, a.start_ms, a.end_ms, a.n, a.sum_value)
                  acc = Some(SessionAcc(t, t, 1, e.value))
                case Some(_) =>
                  // more than a gap BEFORE the current session: a late
                  // straggler forming its own earlier session — emit it
                  // directly (it can no longer be extended reliably)
                  closed += SessionOut(userId, t, t, 1, e.value)
                case None =>
                  acc = Some(SessionAcc(t, t, 1, e.value))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.end_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
