package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-13 operators (#338-#345): survival duals,
  * the as-of direction trio's nearest arbiter, Markov removal-effect
  * attribution, KMV sketch overlap, topic NPMI coherence, deterministic
  * DP noise, DoReMi reweighting, and Holt-Winters seasonality. */
class OpsR13Spec extends SparkSpecBase {

  test("nelson_aalen: hazard accumulates, exp(-H) consistent, risk sets shrink") {
    val rows = core.Sessions.nelsonAalen(spark, sf)
      .orderBy("duration_days").collect()
    assert(rows.nonEmpty)
    var lastH = 0.0
    var lastRisk = Long.MaxValue
    rows.foreach { r =>
      val h = r.getAs[Double]("cum_hazard")
      val nr = r.getAs[Long]("n_risk")
      assert(h >= lastH - 1e-9, "cumulative hazard must be nondecreasing")
      assert(nr <= lastRisk, "risk set must shrink over time")
      assert(math.abs(r.getAs[Double]("na_survival") - math.exp(-h)) < 2e-6,
        "na_survival must be exp(-cum_hazard)")
      lastH = h; lastRisk = nr
    }
    // NA vs KM: same risk-set scaffold, NA survival >= KM survival
    // (1-x <= e^-x termwise), equal to ~O(d/n)^2 when hazards are small
    val km = core.Sessions.survivalKm(spark, sf)
      .select(col("duration_days"), col("survival")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("na_survival") >=
        km(r.getAs[Long]("duration_days")) - 1e-9,
        "Fleming-Harrington survival must dominate Kaplan-Meier")
    }
  }

  test("asof_nearest_click: picks the truly closest click, backward on ties") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_type")).collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Long]("ts_us")))
    val out = core.Relational.asofNearestClick(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (u, pts) = (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"))
      val mine = clicks.filter(_._1 == u)
      val bestGap = mine.map(c => math.abs(c._3 - pts)).min
      assert(r.getAs[Long]("gap_us") == bestGap,
        s"purchase ${r.getAs[Long]("event_id")}: gap ${r.getAs[Long]("gap_us")} != best $bestGap")
      if (r.getAs[String]("direction") == "forward")
        assert(!mine.exists(c => pts - c._3 == bestGap && c._3 <= pts),
          "forward chosen though an equally-close backward click exists")
    }
  }

  test("markov_attribution: a proper attribution table") {
    val rows = core.Sessions.markovAttribution(spark, sf).collect()
    assert(rows.length >= 2, "needs at least two channels")
    val shares = rows.map(_.getAs[Double]("attribution_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"shares sum ${shares.sum}")
    rows.foreach { r =>
      val re = r.getAs[Double]("removal_effect")
      assert(re >= -1e-9 && re <= 1.0, s"removal effect $re out of range")
      val p = r.getAs[Double]("p_conv_full")
      assert(p > 0.0 && p < 1.0, s"conversion probability $p degenerate")
    }
  }

  test("audience_overlap_kmv: exact branch is exact below k, estimates stay sane") {
    val rows = core.Sessions.audienceOverlapKmv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // sf0.001 has 15 users < k=64: every sketch is the full set, so
      // the estimator must DEGENERATE to the exact value
      assert(r.getAs[Double]("jaccard_err") == 0.0,
        s"exact branch must have zero error at sub-k cardinality: $r")
      assert(r.getAs[Double]("est_jaccard") == r.getAs[Double]("exact_jaccard"))
      assert(r.getAs[Double]("est_union") >=
        math.max(r.getAs[Double]("est_a"), r.getAs[Double]("est_b")) - 1e-9)
    }
  }

  test("audience_overlap_kmv: estimator branch stays within KMV error bounds above k") {
    // r13 ADVICE: the sf0.001 corpus (15 users/type) only exercises the
    // exact n<k branch. Synthesize two 500-user audiences sharing 200
    // users (true J = 200/800 = 0.25) so the (k-1)/h_k distinct
    // estimate, the union-sketch truncation at k, and the shared-member
    // numerator all run, and pin them to generous multiples of the
    // published KMV errors (RSE(distinct) ~ 1/sqrt(k-2) ~ 13%,
    // se(J) ~ sqrt(J(1-J)/k) ~ 5.4% at k=64).
    import spark.implicits._
    val rows = (0 until 500).flatMap { i =>
      // type A: users 0..499; type B: users 300..799 (200 shared)
      Seq(("A", i.toLong), ("B", (i + 300).toLong))
    }
    val dir = java.nio.file.Files.createTempDirectory("kmv_events").toString
    rows.toDF("event_type", "user_id")
      .select(monotonically_increasing_id().as("event_id"),
        lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = core.Sessions.audienceOverlapKmv(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("exact_jaccard") == 0.25)
    // estimator branch engaged: n=500 >= k=64, so est_a is an estimate
    assert(math.abs(r.getAs[Double]("est_a") - 500.0) < 250.0,
      s"distinct estimate ${r.getAs[Double]("est_a")} outside 50% of 500")
    assert(math.abs(r.getAs[Double]("est_b") - 500.0) < 250.0)
    assert(math.abs(r.getAs[Double]("est_union") - 800.0) < 400.0)
    // 4-sigma-ish Jaccard band; the branch must NOT degenerate to exact
    assert(r.getAs[Double]("jaccard_err") < 0.25,
      s"estimator error ${r.getAs[Double]("jaccard_err")} implausibly large")
    assert(r.getAs[Double]("est_union") >=
      math.max(r.getAs[Double]("est_a"), r.getAs[Double]("est_b")) - 1e-9)
    // intersection consistency: est_intersection = est_j * est_union
    assert(math.abs(r.getAs[Double]("est_intersection") -
      r.getAs[Double]("est_jaccard") * r.getAs[Double]("est_union")) < 0.5)
  }

  test("topic_coherence_npmi: bounded scores over consistent dfs") {
    val rows = text.TextOps.topicCoherenceNpmi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val npmi = r.getAs[Double]("npmi")
      assert(npmi >= -1.0 - 1e-9 && npmi <= 1.0 + 1e-9, s"npmi $npmi out of [-1,1]")
      assert(r.getAs[Long]("df_ab") <=
        math.min(r.getAs[Long]("df_a"), r.getAs[Long]("df_b")),
        "pair df cannot exceed either marginal df")
      if (r.getAs[Long]("df_ab") == 0) assert(npmi == -1.0)
    }
  }

  test("dp_noisy_counts: deterministic Laplace shape, additive decomposition") {
    val rows = core.Relational.dpNoisyCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("n_noisy") -
        (r.getAs[Long]("n_true") + r.getAs[Double]("noise"))) < 2e-6)
      assert(r.getAs[Double]("epsilon") == 1.0)
    }
    // noise must be two-sided (a one-sided mechanism is a bug)
    assert(rows.exists(_.getAs[Double]("noise") > 0) &&
      rows.exists(_.getAs[Double]("noise") < 0))
    // deterministic: a second run is bit-identical
    val again = core.Relational.dpNoisyCounts(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("doremi_weights: a normalized reweighting that upweights high-excess sources") {
    val rows = text.Classify.doremiWeights(spark, sf).collect()
    assert(rows.length >= 2)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum $wsum")
    rows.foreach { r =>
      assert(r.getAs[Double]("excess") >= 0.0, "excess is clipped at 0")
      assert(r.getAs[Double]("weight") > 0.0)
    }
    // the multiplicative update tilts weight/share by exp(excess): the
    // ratio must follow excess wherever excess strictly increases (tied
    // excesses give equal ratios up to the 6-dp output rounding)
    val byExcess = rows.map(r => (r.getAs[Double]("excess"),
      r.getAs[Double]("weight") / r.getAs[Double]("token_share")))
      .sortBy(_._1)
    byExcess.zip(byExcess.tail).foreach { case ((ea, ra), (eb, rb)) =>
      if (eb - ea > 1e-6)
        assert(rb >= ra - 1e-3,
          s"ratio fell ($ra -> $rb) while excess rose ($ea -> $eb)")
    }
  }

  test("holt_winters: driver replay of the triple recursion matches") {
    val rows = core.Sessions.holtWinters(spark, sf)
      .filter(col("event_type") === "click").orderBy("t").collect()
    assert(rows.length >= 8, "needs a few smoothed days")
    // rebuild the daily series and replay the recursion in plain Scala
    val ys = Tables.events(spark, sf).filter(col("event_type") === "click")
      .groupBy(expr("ts_ns div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (mn, mx) = (ys.keys.min, ys.keys.max)
    val y = (mn to mx).map(d => ys.getOrElse(d, 0L).toDouble).toArray
    var l = y.take(7).sum / 7.0
    var b = (y.slice(7, 14).sum / 7.0 - y.take(7).sum / 7.0) / 7.0
    val sArr = Array.tabulate(7)(i => y(i) - y.take(7).sum / 7.0)
    for (t <- 8 to y.length) {
      val idx = (t - 1) % 7
      val fitted = l + b + sArr(idx)
      val lp = 0.2 * (y(t - 1) - sArr(idx)) + 0.8 * (l + b)
      val bp = 0.1 * (lp - l) + 0.9 * b
      val sp = 0.3 * (y(t - 1) - lp) + 0.7 * sArr(idx)
      val r0 = rows(t - 8)
      assert(math.abs(r0.getAs[Double]("fitted") - fitted) < 1e-5, s"fitted at t=$t")
      assert(math.abs(r0.getAs[Double]("level") - lp) < 1e-5, s"level at t=$t")
      assert(math.abs(r0.getAs[Double]("trend") - bp) < 1e-5, s"trend at t=$t")
      assert(math.abs(r0.getAs[Double]("seasonal") - sp) < 1e-5, s"seasonal at t=$t")
      l = lp; b = bp; sArr(idx) = sp
    }
  }
}
