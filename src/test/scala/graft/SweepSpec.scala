package graft

import org.apache.spark.sql.functions._

/** Cross-row invariants for the parameter-sweep tables (#261, #289,
  * #290, #292) and the r7 grid/interp additions — the monotonicity
  * physics each tuning table's story depends on. */
class SweepSpec extends SparkSpecBase {

  test("lsh planes sweep: candidates and recall both fall as planes rise") {
    val rows = sim.Ann.lshPlanesSweep(spark, sf)
      .orderBy(col("planes")).collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("avg_candidates") <= a.getAs[Double]("avg_candidates"),
        "more planes must not grow the candidate set")
      assert(b.getAs[Double]("recall_at10") <= a.getAs[Double]("recall_at10"),
        "more planes must not raise candidate-coverage recall")
    }
    assert(rows.head.getAs[Double]("recall_at10") > 0.0)
  }

  test("minhash bands sweep: candidates and recall grow with band count") {
    val rows = dedup.Dedup.minhashBandsSweep(spark, sf)
      .orderBy(col("bands")).collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_cand") >= a.getAs[Long]("n_cand"),
        "more bands must not shrink the candidate set")
      assert(b.getAs[Double]("recall") >= a.getAs[Double]("recall"),
        "more bands must not lower recall")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    }
  }

  test("session gap sweep: looser gaps merge sessions monotonically") {
    val rows = core.Sessions.sessionGapSweep(spark, sf)
      .orderBy(col("gap_minutes")).collect()
    assert(rows.length == 3)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_sessions") <= a.getAs[Long]("n_sessions"),
        "a looser gap can only merge sessions, never split them")
      assert(b.getAs[Double]("avg_events") >= a.getAs[Double]("avg_events"))
    }
  }

  test("ivf cell balance: shares sum to one, skew averages one") {
    val rows = sim.Ann.ivfCellBalance(spark, sf).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    val skewMean = rows.map(_.getAs[Double]("skew")).sum / rows.length
    assert(math.abs(skewMean - 1.0) < 1e-4, s"mean skew $skewMean")
  }

  test("tf activity ulm: complete grid, bounded correlations, consistent signs") {
    val rows = sc.SingleCell.tfActivityUlm(spark, sf)
    val tfs = Tables.part(spark, sf).select(col("p_brand")).distinct().count()
    // every entity scores against EVERY TF (the dense activity matrix)
    val perEnt = rows.groupBy(col("entity")).agg(countDistinct(col("tf")).as("nt"))
      .filter(col("nt") =!= tfs).count()
    assert(perEnt == 0, "an entity is missing TF rows")
    val bad = rows.filter(abs(col("r")) > 1.0 + 1e-9 ||
      (col("r") > 0 && col("activity_t") < 0) ||
      (col("r") < 0 && col("activity_t") > 0)).count()
    assert(bad == 0, "correlation out of range or t-stat sign mismatch")
    // masks partition the universe, so activities can't all lean one way
    val both = rows.agg(
      sum(when(col("activity_t") > 0, 1).otherwise(0)).as("p"),
      sum(when(col("activity_t") < 0, 1).otherwise(0)).as("n")).collect()(0)
    assert(both.getLong(0) > 0 && both.getLong(1) > 0)
  }

  test("knn DA screen: null-world z-scores center near zero, flags are a minority") {
    // conditions are vec_id parity — a NULL world by construction, so
    // the binomial z must behave like one: centered, few |z| >= 2
    val rows = sim.GraphOps.knnDaScreen(spark, sf).collect()
    assert(rows.nonEmpty)
    val zs = rows.map(_.getAs[Double]("da_z"))
    val mean = zs.sum / zs.length
    assert(math.abs(mean) < 0.5, s"null-world z mean drifted: $mean")
    val flagged = rows.count(_.getAs[Boolean]("da_flag"))
    assert(flagged.toDouble / rows.length < 0.25,
      s"null world flagged ${flagged}/${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cond0") <= r.getAs[Long]("k_eff"))
    }
  }

  test("grid interpolation stays inside its brackets and agrees with LOCF on observed hours") {
    val interp = core.Sessions.timeGridInterp(spark, sf)
    val locf = core.Sessions.timeGridFill(spark, sf)
    // observed (non-filled) hours must carry the same value in both
    val joined = interp.join(locf, Seq("user_id", "hour_idx"))
      .filter(!col("interpolated") && !col("filled"))
      .filter(abs(round(col("value_interp"), 6) - col("value_filled")) > 1e-9)
    assert(joined.count() == 0, "observed hours diverge between interp and LOCF")
    // every interpolated value lies within the user's observed range
    val range = interp.filter(!col("interpolated"))
      .groupBy(col("user_id"))
      .agg(min(col("value_interp")).as("lo"), max(col("value_interp")).as("hi"))
    val outside = interp.filter(col("interpolated")).join(range, "user_id")
      .filter(col("value_interp") < col("lo") - lit(1e-9) ||
        col("value_interp") > col("hi") + lit(1e-9))
    assert(outside.count() == 0, "interpolated value escaped the observed range")
  }
}
