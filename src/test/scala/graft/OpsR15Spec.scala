package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-15 operators (#353-#358): unigram-LM
  * tokenizer train/encode, the dedup threshold sweep, SRM check,
  * difference-in-differences, and corpus chrF — plus the r14 ADVICE
  * regression pins (corpus BLEU on short docs, CUPED integer midpoint). */
class OpsR15Spec extends SparkSpecBase {

  test("unigram_lm_train: probs normalize, chars always covered, multi-char pieces earn usage") {
    val rows = text.Vocab.unigramLmTrain(spark, sf).collect()
    assert(rows.nonEmpty)
    val probMass = rows.map(_.getAs[Double]("prob")).sum
    assert(math.abs(probMass - 1.0) < 1e-3, s"piece probs sum to $probMass")
    // coverage guarantee: every single char of the corpus vocabulary
    // survives training (possibly at zero usage / penalty score)
    val pieces = rows.map(_.getAs[String]("piece")).toSet
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr(
        "flatten(transform(regexp_extract_all(lower(text), '[a-z]+', 0), " +
          "w -> transform(sequence(1, length(w)), i -> substring(w, i, 1))))")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // the EM actually learned something: some multi-char piece carries
    // usage (a degenerate char-only segmentation would fail this)
    assert(rows.exists(r =>
      r.getAs[Long]("piece_len") > 1 && r.getAs[Long]("usage") > 0),
      "no multi-char piece earned usage — EM degenerated to chars")
    rows.foreach { r =>
      assert(r.getAs[Long]("piece_len") >= 1 && r.getAs[Long]("piece_len") <= 4)
      assert(r.getAs[Long]("usage") >= 0)
    }
  }

  test("unigram_lm_encode: tokens_per_word in [1/MaxLen-bound, word length] band") {
    val rows = text.Vocab.unigramLmEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tpw = r.getAs[Double]("tokens_per_word")
      // each word is 1..len pieces; pieces are ≥1 char and ≤4 chars
      assert(tpw >= 0.25 && tpw <= 32.0, s"tokens_per_word $tpw out of band")
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"),
        "a word segments into at least one piece")
    }
  }

  test("unigram segmentation beats or ties the char baseline in likelihood terms") {
    // indirectly: total tokens under the trained vocab must be at most
    // the char-segmentation token count (Viterbi maximizes score, and
    // any multi-char piece strictly shortens its word's segmentation)
    val enc = text.Vocab.unigramLmEncode(spark, sf)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    assert(enc <= chars, s"unigram produced MORE tokens ($enc) than chars ($chars)")
  }

  test("dedup_threshold_sweep: pairs/docs shrink and capture falls as threshold rises") {
    val rows = dedup.Dedup.dedupThresholdSweep(spark, sf)
      .orderBy(col("threshold")).collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_pairs") <= a.getAs[Long]("n_pairs"),
        "raising the threshold must not admit more pairs")
      assert(b.getAs[Long]("n_dup_docs") <= a.getAs[Long]("n_dup_docs"),
        "raising the threshold must not flag more docs")
      assert(b.getAs[Double]("p_capture") >= a.getAs[Double]("p_capture"),
        "the 16x4 S-curve capture probability rises with J")
      assert(b.getAs[Double]("mean_jaccard") >= a.getAs[Double]("mean_jaccard"),
        "surviving pairs' mean J rises with the cut")
    }
    rows.foreach { r =>
      val t = r.getAs[Double]("threshold")
      assert(math.abs(r.getAs[Double]("p_capture") -
        dedup.Dedup.capture16x4(t)) < 1e-9)
    }
  }

  test("srm_check: arms partition users and the chi-square identity holds") {
    val rows = core.Sessions.srmCheck(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, a0, a1) = (r.getAs[Long]("n_users"),
        r.getAs[Long]("n_arm0"), r.getAs[Long]("n_arm1"))
      assert(a0 + a1 == n, "arms must partition the distinct users")
      val d = (a0 - a1).toDouble
      assert(math.abs(r.getAs[Double]("chi2") - d * d / n) < 1e-6)
      assert(r.getAs[Boolean]("srm_flag") == (d * d / n > 3.841))
    }
  }

  test("diff_in_diff: the DiD identity over the 2x2 cell means") {
    val rows = core.Sessions.diffInDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val did = (r.getAs[Double]("m_treat_post") - r.getAs[Double]("m_treat_pre")) -
        (r.getAs[Double]("m_ctrl_post") - r.getAs[Double]("m_ctrl_pre"))
      // cells are rounded independently of did: allow rounding slack
      assert(math.abs(did - r.getAs[Double]("did")) < 5e-6,
        s"DiD ${r.getAs[Double]("did")} != cell identity $did")
    }
  }

  test("chrf_proxy: precision/recall/F consistency and one corpus scalar") {
    val rows = text.TextOps.chrfProxy(spark, sf).orderBy("n").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (p, rr, f) = (r.getAs[Double]("p_n"), r.getAs[Double]("r_n"),
        r.getAs[Double]("f_n"))
      assert(p >= 0 && p <= 1 && rr >= 0 && rr <= 1)
      assert(f <= math.max(p, rr) + 1e-6, "F cannot exceed both P and R")
      assert(r.getAs[Long]("clipped") <= math.min(
        r.getAs[Long]("total_cand"), r.getAs[Long]("total_ref")))
    }
    assert(rows.map(_.getAs[Double]("chrf")).distinct.length == 1,
      "chrf is one corpus-level scalar")
    val mean = rows.map(_.getAs[Double]("f_n")).sum / 6.0
    assert(math.abs(rows.head.getAs[Double]("chrf") - mean) < 5e-6)
  }

  test("tokenizer_compare: consistent with both encode queries, ratio sane") {
    val rows = text.Vocab.tokenizerCompare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, bt, ut) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("bpe_tokens"), r.getAs[Long]("uni_tokens"))
      assert(bt >= nw && ut >= nw, "every word is at least one token under both")
      val ratio = r.getAs[Double]("uni_over_bpe")
      assert(math.abs(ratio - ut.toDouble / bt) < 1e-5)
      assert(ratio > 0.1 && ratio < 10.0, s"ratio $ratio out of band")
    }
  }

  // r14 ADVICE pin: a sub-n-word doc must not crash the BLEU gram
  // builder (sequence(1,0) descending + slice-at-0 was the latent bug)
  test("corpus_bleu gram builder survives docs shorter than n words") {
    import spark.implicits._
    val tiny = Seq((1L, "one"), (2L, "two words"), (3L, ""))
      .toDF("doc_id", "text")
    tiny.createOrReplaceTempView("shortdocs")
    val out = tiny
      .select((pmod(col("doc_id"), lit(2)) === 1).as("cand"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .select(col("cand"), explode(expr(
        "CASE WHEN size(ws) >= 4 THEN transform(sequence(1, size(ws) - 3), " +
          "i -> array_join(slice(ws, i, 4), ' ')) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END")).as("g"))
      .collect()
    assert(out.isEmpty, "3 short docs yield zero 4-grams, not an exception")
  }

  // r14 ADVICE pin: the CUPED midpoint is exact integer division —
  // (min+max) div 2 on values beyond 2^53 where fp division drifts
  test("cuped midpoint: integer div matches exact arithmetic beyond 2^53") {
    import spark.implicits._
    val mn = 3402823600000000000L
    val mx = 3402823600000000123L
    val mid = Seq((mn, mx)).toDF("mn", "mx")
      .select(expr("(mn + mx) div 2").as("mid")).collect()(0).getLong(0)
    assert(mid == (mn + mx) / 2, "div must be exact integer midpoint")
    // the fp route loses the low bits at this magnitude (ulp ≈ 1024 at
    // 6.8e18) — the silent pre/post misclassification this pins against
    val fpMid = ((mn + mx) / 2.0).toLong
    assert(fpMid != mid, "fp midpoint should drift here; if not, the pin is dead")
  }
}
