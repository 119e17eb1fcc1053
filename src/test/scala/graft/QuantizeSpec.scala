package graft

import org.apache.spark.sql.Row

/** SQ8 semantics: the quantizer must be near-lossless at 8 bits on
  * this corpus (error bounded by half a code step per dim), and the
  * quantized ANN paths must agree closely with exact search. */
class QuantizeSpec extends SparkSpecBase {

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "neighbor_id").collect()
      .map { case Row(q: Long, n: Long) => (q, n) }
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  test("matryoshka eval reports per-query truncation recall faithfully") {
    val rows = sim.Quantize.annMatryoshkaEval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") == 10L, "full-dim truth is a rank-10 cut")
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - r.getAs[Long]("n_hit").toDouble / 10.0) < 1e-9)
    }
    // this synthetic corpus spreads signal uniformly across dims, so a
    // 16/64 prefix retrieves near chance — which is precisely the
    // deployment-gating fact the eval exists to surface. Sanity-pin the
    // two sides agree at least once rather than asserting MRL structure
    // the generator never put in.
    assert(rows.map(_.getAs[Long]("n_hit")).sum >= 1, "n_hit must not be uniformly zero")
  }

  test("JL projection eval: sound recall accounting + shared plane stream") {
    val rows = sim.Quantize.annJlProjEval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") == 10L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - r.getAs[Long]("n_hit").toDouble / 10.0) < 1e-9)
    }
    // This corpus spreads signal uniformly across all 64 dims (the
    // matryoshka test's finding), so NO 16-dim view retrieves well —
    // but JL mixes every input dim into every output dim, so it must
    // beat the 16-dim PREFIX (which discards 3/4 of the signal) and
    // clear chance (10/n ≈ 0.005) by an order of magnitude.
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    val mat = sim.Quantize.annMatryoshkaEval(spark, sf).collect()
    val matMean = mat.map(_.getAs[Double]("recall")).sum / mat.length
    info(s"JL 16-dim recall@10 = $mean (matryoshka 16-prefix $matMean)")
    assert(mean >= matMean,
      s"JL $mean under prefix-truncation $matMean — mixing must dominate discarding")
    assert(mean >= 0.05, s"JL recall $mean within noise of chance — projection broken")
    // invariant: the LSH bucket IS the sign vector of the first 5
    // projections (one shared SplitMix64 plane matrix engine-wide)
    import org.apache.spark.sql.functions._
    val chk = Tables.embeddings(spark, sf).limit(64)
      .select(
        graft.functions.VectorFunctions.hyperplaneBucket(
          col("embedding").cast("array<double>"), 5).as("bucket"),
        graft.functions.VectorFunctions.randomProjection(
          col("embedding").cast("array<double>"), 5).as("proj"))
      .collect()
    chk.foreach { r =>
      val bucket = r.getLong(0)
      val proj = r.getSeq[Double](1)
      val signBits = proj.zipWithIndex.map { case (p, j) =>
        if (p > 0) 1L << j else 0L }.sum
      assert(signBits == bucket,
        s"RandomProjection signs $signBits disagree with hyperplaneBucket $bucket")
    }
    // r11 verdict item 7: >64-dim inputs now draw from the DISJOINT
    // negative-key extension stream instead of throwing (the r10 guard).
    // Invariants pinned here:
    //  (a) ≤64-dim outputs are bit-identical to the historical j*64+i
    //      stream (planeKey(j, i) == j*64+i for i < 64);
    //  (b) a 128-dim input evaluates through a REAL plan (codegen path)
    //      and matches the interpreted reference built on planeKey;
    //  (c) the old aliasing cannot recur: the extension key for
    //      (j, dim 64) differs from the base key for (j+1, dim 0) —
    //      exactly the collision the r10 throw existed to prevent;
    //  (d) the stream is finite: 4097 dims still throws.
    import graft.functions.HyperplaneBucket.{mix64, planeKey}
    for (j <- 0 until 8; i <- 0 until 64)
      assert(planeKey(j, i) == j * 64L + i, s"base stream moved at ($j,$i)")
    for (j <- 0 until 8)
      assert(planeKey(j, 64) != planeKey(j + 1, 0) &&
        mix64(planeKey(j, 64)) != mix64(planeKey(j + 1, 0)),
        s"extension aliases plane ${j + 1}'s dim 0")
    def refProj(v: Seq[Double], outDims: Int): Seq[Double] =
      (0 until outDims).map { j =>
        v.indices.map { i =>
          val m = ((mix64(planeKey(j, i)) % 2000003L) + 2000003L) % 2000003L
          v(i) * (m.toDouble / 1000001.0 - 1.0)
        }.sum
      }
    val v128 = (0 until 128).map(i => math.sin(i * 0.7) * 3.0)
    val wideRow = spark.createDataFrame(Seq(Tuple1(v128))).toDF("v")
      .select(graft.functions.VectorFunctions.randomProjection(col("v"), 6).as("p"))
      .head.getSeq[Double](0)
    val expect128 = refProj(v128, 6)
    wideRow.zip(expect128).zipWithIndex.foreach { case ((g, e), j) =>
      assert(math.abs(g - e) < 1e-9, s"128-dim JL out dim $j: $g vs $e") }
    val tooWide = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq.fill(4097)(0.5), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    intercept[IllegalArgumentException] {
      graft.functions.RandomProjection(tooWide, 5).eval(null)
    }
    intercept[IllegalArgumentException] {
      graft.functions.HyperplaneBucket(tooWide, 5).eval(null)
    }
  }

  test("quantize audit: error bounded by half a code step, cosine near 1") {
    val audit = sim.Quantize.embeddingQuantizeAudit(spark, sf).collect()
    assert(audit.nonEmpty)
    // widest per-dim span over the corpus bounds every |x - x̂| by
    // span/2/255 (round-to-nearest code)
    val spans = Tables.embeddings(spark, sf)
      .selectExpr("posexplode(cast(embedding as array<double>)) as (d, x)")
      .groupBy("d").agg(org.apache.spark.sql.functions.expr("max(x) - min(x)").as("span"))
      .agg(org.apache.spark.sql.functions.max("span")).head.getDouble(0)
    val bound = spans / 2.0 / 255.0 + 1e-12
    audit.foreach { r =>
      val maxe = r.getAs[Double]("max_abs_err")
      val cos = r.getAs[Double]("avg_cos_sim")
      assert(maxe <= bound, s"label ${r.get(0)}: max_abs_err $maxe > $bound")
      assert(cos >= 0.999, s"label ${r.get(0)}: avg_cos_sim $cos below 0.999")
      assert(r.getAs[Double]("avg_mse_e6") > 0.0)
    }
  }

  test("SQ brute-force top-k nearly matches exact search (ADC recall)") {
    val exact = topkMap(sim.Ann.annBruteforceTopk(spark, sf))
    val sq = topkMap(sim.Quantize.annSqTopk(spark, sf))
    assert(sq.keySet == exact.keySet)
    val recalls = sq.map { case (q, ns) => ns.intersect(exact(q)).size / 10.0 }
    val recall = recalls.sum / recalls.size
    info(s"SQ8 ADC recall@10 = $recall")
    // 8-bit scalar quantization perturbs cosines by ~1e-4 — only
    // near-tied neighbors can swap across the rank-10 cut
    assert(recall >= 0.9, s"SQ recall $recall — quantization is not near-lossless")
  }

  test("IVF+SQ top-k keeps IVF's recall under quantization") {
    val exact = topkMap(sim.Ann.annBruteforceTopk(spark, sf))
    val ivfSq = topkMap(sim.Quantize.annIvfSqTopk(spark, sf))
    assert(ivfSq.nonEmpty)
    val recalls = ivfSq.collect { case (q, ns) if exact.contains(q) =>
      ns.intersect(exact(q)).size / 10.0 }
    val recall = recalls.sum / recalls.size
    info(s"IVF+SQ8 recall@10 (nprobe=4/16) = $recall")
    // same bar as the full-precision IVF spec: nearest-centroid probing
    // over the int8 corpus must still clearly beat the ~0.25 random-
    // sampling baseline of a 4/16-cell scan
    assert(recall > 0.4, s"IVF+SQ recall $recall no better than random sampling")
  }

  test("binary hamming shortlist + exact rerank recovers most true neighbors") {
    val exact = topkMap(sim.Ann.annBruteforceTopk(spark, sf))
    val binary = topkMap(sim.Quantize.annBinaryTopk(spark, sf))
    val rerank = topkMap(sim.Quantize.annBinaryRerankTopk(spark, sf))
    assert(binary.keySet == exact.keySet && rerank.keySet == exact.keySet)
    def meanRecall(m: Map[Long, Set[Long]]) =
      m.map { case (q, ns) => ns.intersect(exact(q)).size / 10.0 }.sum / m.size
    val rBin = meanRecall(binary); val rRer = meanRecall(rerank)
    info(s"binary hamming recall@10 = $rBin, after exact rerank = $rRer")
    // sign-bit hamming is a coarse proxy — but re-ranking a 50-deep
    // shortlist with exact cosine must recover a clear majority of the
    // true top-10 and strictly dominate the raw hamming ranking
    assert(rRer >= rBin - 1e-9, "rerank made recall worse")
    assert(rRer >= 0.5, s"two-stage recall $rRer below 0.5")
    // hamming output is rank-consistent: ham nondecreasing with rk
    val ham = sim.Quantize.annBinaryTopk(spark, sf)
      .select("qid", "hamming", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    ham.values.foreach { xs =>
      val sorted = xs.toSeq.sortBy(_._3).map(_._2)
      assert(sorted == sorted.sorted, "hamming not nondecreasing in rank")
    }
  }

  test("RRF fusion: candidates come from the input rankers, both-ranker hits outrank singles") {
    val lsh = topkMap(sim.Ann.annLshTopk(spark, sf))
    val bin = topkMap(sim.Quantize.annBinaryTopk(spark, sf))
    val fused = sim.Quantize.annRrfFusionTopk(spark, sf)
      .select("qid", "neighbor_id", "rrf_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fused.nonEmpty)
    fused.foreach { case (q, n, s) =>
      assert(lsh.getOrElse(q, Set.empty).contains(n)
          || bin.getOrElse(q, Set.empty).contains(n),
        s"fused ($q,$n) in neither input ranking")
      // a both-ranker candidate scores at least 2/(60+10); a single-
      // ranker one at most 1/61 — dual evidence always dominates
      val inBoth = lsh.getOrElse(q, Set.empty).contains(n) &&
        bin.getOrElse(q, Set.empty).contains(n)
      if (inBoth) assert(s >= 2.0 / 70.0 - 1e-9)
      else assert(s <= 1.0 / 61.0 + 1e-9)
    }
    val exact = topkMap(sim.Ann.annBruteforceTopk(spark, sf))
    def meanRecall(m: Map[Long, Set[Long]]) =
      m.map { case (q, ns) => ns.intersect(exact(q)).size / 10.0 }.sum / m.size
    val byQ = fused.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    info(s"RRF recall@10 = ${meanRecall(byQ)} (lsh ${meanRecall(lsh)}, binary ${meanRecall(bin)})")
  }
}
