package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-14 operators (#346-#352): HLL register
  * sketches, CUPED variance reduction, Good-Turing smoothing, PAV
  * isotonic calibration, stratified propensity matching, corpus BLEU,
  * and MMR diversified retrieval. */
class OpsR14Spec extends SparkSpecBase {

  test("hll_distinct: registers bounded, estimate near exact at sketch accuracy") {
    val rows = core.Sessions.hllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("registers_used")
      val n = r.getAs[Long]("n_exact")
      assert(v <= math.min(n, 256L), "cannot use more registers than users")
      assert(r.getAs[Long]("m") == 256L)
      assert(r.getAs[Double]("est_distinct") > 0)
      // linear-counting regime at sub-m cardinalities is tight; the
      // generous band still catches a broken rho or register merge
      assert(r.getAs[Double]("rel_err") < 0.35,
        s"HLL error ${r.getAs[Double]("rel_err")} out of band: $r")
    }
  }

  test("cuped_adjustment: adjusted variance never exceeds raw, reduction is corr^2") {
    val rows = core.Sessions.cupedAdjustment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vy = r.getAs[Double]("var_y")
      val vc = r.getAs[Double]("var_y_cuped")
      assert(vc <= vy + 1e-6, s"CUPED increased variance: $r")
      val red = r.getAs[Double]("var_reduction")
      assert(red >= 0.0 && red <= 1.0 + 1e-9, s"reduction $red outside [0,1]")
    }
  }

  test("good_turing_mass: MLE mass sums to 1, unseen mass = N1/N") {
    val rows = text.Vocab.goodTuringMass(spark, sf).collect()
    assert(rows.nonEmpty)
    val mleMass = rows.map(r =>
      r.getAs[Double]("p_mle") * r.getAs[Long]("n_r")).sum
    assert(math.abs(mleMass - 1.0) < 1e-4, s"MLE mass $mleMass != 1")
    val n = rows.map(r => r.getAs[Long]("r") * r.getAs[Long]("n_r")).sum.toDouble
    val n1 = rows.find(_.getAs[Long]("r") == 1L).map(_.getAs[Long]("n_r")).getOrElse(0L)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("unseen_mass") - n1 / n) < 1e-5)
      if (!r.isNullAt(r.fieldIndex("r_star")))
        assert(r.getAs[Double]("r_star") > 0)
    }
  }

  test("isotonic_calibration: fit is monotone and preserves the weighted mean") {
    val rows = core.Scores.isotonicCalibration(spark, sf)
      .orderBy("bin").collect()
    assert(rows.length >= 3)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("iso_rate") <= b.getAs[Double]("iso_rate") + 1e-9,
        s"PAV fit not monotone at bins ${a.getAs[Long]("bin")}->${b.getAs[Long]("bin")}")
    }
    val w = rows.map(_.getAs[Long]("n").toDouble)
    val raw = rows.map(_.getAs[Double]("rate"))
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    val mRaw = w.zip(raw).map { case (a, b) => a * b }.sum / w.sum
    val mIso = w.zip(iso).map { case (a, b) => a * b }.sum / w.sum
    assert(math.abs(mRaw - mIso) < 1e-4,
      s"PAV must preserve the weighted mean: $mRaw vs $mIso")
    iso.foreach(v => assert(v >= -1e-9 && v <= 1.0 + 1e-9))
  }

  test("propensity_match: brute-force nearest control within stratum") {
    val out = core.Scores.propensityMatch(spark, sf).collect()
      .map(r => (r.getAs[Long]("treated_id"),
        (r.getAs[Number]("nation").longValue, r.getAs[Long]("control_id"),
          r.getAs[Double]("score_diff")))).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_acctbal"),
        col("c_nationkey").cast("long"),
        (col("c_mktsegment") === "BUILDING").as("t")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    val controls = cust.filter(!_._4).groupBy(_._3)
    val treated = cust.filter(_._4)
    assert(out.nonEmpty && treated.nonEmpty)
    treated.foreach { case (id, s, nat, _) =>
      controls.get(nat) match {
        case Some(cs) =>
          val best = cs.map(c => math.abs(c._2 - s)).min
          val (_, matched, diff) = out(id)
          assert(math.abs(diff - best) < 1e-6,
            s"treated $id matched at diff $diff, brute-force best $best")
          assert(cs.exists(c => c._1 == matched &&
            math.abs(math.abs(c._2 - s) - best) < 1e-6))
        case None => assert(!out.contains(id))
      }
    }
  }

  test("corpus_bleu_proxy: precisions fall with n, bleu consistent with its parts") {
    val rows = text.TextOps.corpusBleuProxy(spark, sf).orderBy("n").collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("p_n") >= b.getAs[Double]("p_n") - 1e-9,
        "modified precision should not rise with n on natural text")
    }
    val bp = rows.head.getAs[Double]("bp")
    assert(bp > 0 && bp <= 1.0)
    val bleu = rows.head.getAs[Double]("bleu")
    val geo = math.exp(rows.map(r => math.log(r.getAs[Double]("p_n"))).sum / 4.0)
    assert(math.abs(bleu - bp * geo) < 1e-3, s"bleu $bleu != bp*geo ${bp * geo}")
    rows.foreach { r =>
      assert(r.getAs[Long]("clipped") <= r.getAs[Long]("total"))
    }
  }

  test("mmr_diversified_topk: 5 distinct picks, top pick is the relevance argmax") {
    val rows = sim.Ann.mmrDiversifiedTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (q, picks) =>
      assert(picks.length == 5, s"query $q selected ${picks.length} != 5")
      assert(picks.map(_.getAs[Long]("vec_id")).distinct.length == 5,
        s"query $q repeated a pick")
      val byPos = picks.sortBy(_.getAs[Long]("pos"))
      val relMax = picks.map(_.getAs[Double]("relevance")).max
      assert(byPos.head.getAs[Double]("relevance") == relMax,
        s"query $q pos-1 is not the relevance argmax")
      // mmr = 0.7*rel - 0.3*maxSim with maxSim in [-1, 1] (cosines can
      // be negative, so the penalty term can RAISE the score)
      byPos.tail.foreach { p =>
        val slack = p.getAs[Double]("mmr_score") - 0.7 * p.getAs[Double]("relevance")
        assert(math.abs(slack) <= 0.3 + 1e-6,
          s"mmr inconsistent with a [-1,1] max-similarity: $p")
      }
    }
  }
}
