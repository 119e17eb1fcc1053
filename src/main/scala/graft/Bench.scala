package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Per-round benchmark main: times the headline queries at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * The set below is every registered operator EXCEPT:
  *  - dedup_ngram_jaccard: the deliberately-exact inverted-index
  *    baseline — Σ df² ≈ 1.5e9 intermediate rows at sf0.1 on this
  *    pathologically low-vocab corpus. Its production/scale twin
  *    dedup_minhash_lsh IS benchmarked (same output, LSH-bounded work).
  *  - dedup_components: consumes the exact pair list above, skipped for
  *    the same reason; its scale twin dedup_components_lsh (same
  *    component logic over LSH pairs) IS benchmarked.
  * (The r6 grid-Lloyd/grid-PCA graduations removed the old MLlib
  * skips — every clustering/reduction query is now a pure DataFrame
  * pipeline and is benchmarked.)
  * Results are fully materialized through a noop datasource sink (not
  * count(), which would let Spark skip projection work).
  */
object Bench {
  private val skip = Set(
    "dedup_ngram_jaccard", "dedup_components", "dedup_containment",
    "dup_pairs_by_source",
    // offline calibration audit whose TRUTH side is the exact
    // inverted-index pair set above — same quarantine; the production
    // banding path it tunes (dedup_minhash_lsh) IS benchmarked
    "minhash_bands_sweep",
    // exact BNL oracle paths of #206/#218: each broadcasts an entire
    // batch (≈half the embedding corpus) as the small side — fine at
    // sf0.1, quadratic at a larger gate SF. Their _lsh scale twins ARE
    // benchmarked (same output contract, bounded bucket fan-out) —
    // the dedup_ngram_jaccard convention.
    "mnn_pairs", "bitext_margin_mining",
    // exact-ECDF oracle twin of #94: per-pair window partitions over
    // DISTINCT VALUES approach |rows| on continuous data (r7 verdict
    // item 2). Its pre-binned scale twin pairwise_ks_binned (≤256-row
    // partitions by construction) IS benchmarked.
    "pairwise_ks",
    // exact all-pairs cosine oracle paths (r10 verdict item 3): the
    // sf0.1→sf1 table measured them at 19.1×/19.4×/15.7× on 10× data —
    // super-linear BY DESIGN (each point scores every other point).
    // Their `_lsh` production twins (2.3×/5.4×/2.8× on the same table)
    // ARE benchmarked — the dedup_ngram_jaccard convention.
    "dbscan_embeddings", "local_lisi", "dedup_embedding",
    // the 15 exact kNN-graph feed queries (r12 verdict item 2): every
    // one sits on Ann.knnEdges(exact=true), which scores ALL pairs —
    // O(n²) by design (the DuckDB-checkable oracle feed). The r12 sf3
    // octave measured the asymptote on 3× data: snn_graph 22.4×,
    // knn_da_screen 8.7×, knn_components 8.4×, knn_assortativity 8.1×,
    // knn_label_noise 6.6× (n² on 3× = 9×). Their `_lsh` twins — same
    // graph logic over hyperplane-bucketed candidate edges, sub-n² at
    // sf3 (knn_label_noise_lsh 4.8×) — ARE benchmarked: the
    // dbscan/local_lisi/dedup_embedding convention.
    "kcore_knn", "knn_assortativity", "knn_bfs_dists",
    "knn_clustering_coeff", "knn_components", "knn_da_screen",
    "knn_label_noise", "label_prop_knn", "leiden_refine", "louvain_knn",
    "louvain_snn", "modularity_score", "pagerank_knn", "ppr_knn",
    "snn_graph",
    // the streaming replay lane (r10 verdict item 8): correctness-gate
    // entries that collect the fact table to a driver-side MemoryStream
    // — by construction not a scale path; the batch twins
    // (windowed_events, sessionize_events, active_users, psi_drift,
    // range_join_clicks, filter_decision) carry the scale numbers
    "stream_windowed_replay", "stream_sessionize_replay",
    "stream_dau_replay", "stream_psi_replay", "stream_ingest_filter_replay",
    "stream_click_attribution_replay", "stream_funnel_replay",
    "stream_neardup_replay")

  /** Parse a previous round's bench artifact into name → seconds.
    * Accepts BOTH artifact shapes: the builder's raw full map AND the
    * driver's wrapper, whose JSON line sits ESCAPED inside a "tail"
    * string (\"name\":2.72) — unescape before regexing or a driver-map
    * PREV silently yields an empty map and the driftSet degrades to
    * the hand list (r12: the exact failure this machinery was built
    * to avoid). \s* after every colon: builder maps are written
    * compact, but older artifacts (r10's sf1 map) came through a
    * pretty-printing serializer with ": " — the r12 sf1 sweep parsed
    * 0 PREV queries off exactly that. Spec-pinned in BenchPrevSpec. */
  /** Newest committed builder full map in cwd (highest round number;
    * `_final` variants of the same round sort after the base name), or
    * None when the repo has no full maps yet. Spec-pinned in
    * BenchPrevSpec. */
  private[graft] def discoverPrev(
      dir: java.nio.file.Path = java.nio.file.Paths.get(".")): Option[String] = {
    val re = """BENCH_builder_r(\d+)_full\w*\.json""".r
    val listed =
      try {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString).toVector
        finally s.close()
      } catch { case _: java.io.IOException => Vector.empty }
    listed.flatMap { f =>
      re.findFirstMatchIn(f).filter(_.matched == f)
        .map(m => (m.group(1).toInt, f))
    }.sorted.lastOption.map { case (_, f) => dir.resolve(f).toString }
  }

  private[graft] def parsePrev(raw: String): Map[String, Double] = {
    val txt = raw.replace("\\\"", "\"")
    val at = txt.indexOf("\"queries\":")
    if (at < 0) Map.empty
    else {
      val qs = txt.substring(at + 10)
      val re = """"([a-z0-9_]+)":\s*\{?\s*(?:"suite":\s*)?(-?[0-9.]+)""".r
      re.findAllMatchIn(qs).map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  def main(args: Array[String]): Unit = {
    // "--list-skip": print the skip set (one name per line) and exit —
    // tools/close_round.sh derives the timed-query set from THIS, not
    // from regex-scraping the Set literal above (r13 ADVICE: the
    // scrape stopped at the first comment line ending in ')', seeing
    // 8 of the 34 names and failing the coverage gate spuriously).
    if (args.headOption.contains("--list-skip")) {
      skip.toSeq.sorted.foreach(println)
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576") // native TopK agg state is O(k) per group; the 128-key default would sort-fallback and re-sort every scored row
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: parquet footers, codegen JIT, broadcast machinery —
    // otherwise the alphabetically-first query absorbs ~4s of one-time
    // session cost and the per-query numbers lie.
    Tables.names.foreach { t =>
      try Tables.table(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q5_region_revenue")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // min of N consecutive runs per query: single-run numbers on a
    // shared box swing ±50% with machine load; the minimum is the
    // reproducible steady-state cost that projects to cluster scale
    // (3 runs: whole-suite sweeps observed ±20% drift between full
    // passes under load — the third sample reliably catches the
    // steady state the first two sometimes both miss)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // local iteration aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => skip.contains(q._1))
      .filter(q => only.forall(_.contains(q._1)))
      .map { case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e"); -1.0 }
          finally {
            // drop per-build persists, EMPTY the memo caches (r6 ADVICE:
            // every timed run is COLD — a query that consumes a shared
            // Lloyd/Louvain/PQ/Harmony state pays its own state build;
            // cache-hit times no longer leak into the committed map and
            // the numbers are independent of query execution order), and
            // release localCheckpoint blocks DIRECTLY: localCheckpoint
            // registers its RDD in sc.persistentRdds, so a blocking
            // unpersist sweep frees the blocks deterministically. The
            // old System.gc() route (lean on the ContextCleaner's weak
            // refs) was the r10 regression cluster: with
            // -XX:+ExplicitGCInvokesConcurrent the "untimed" GC ran
            // concurrently INSIDE the next timed run (dsir_weights_hashed
            // isolated 1.38→3.03 s with zero code change); without the
            // flag a 100 GB-heap STW full GC between every run dominated
            // sf1 WALL time. Explicit unpersist has neither cost.
            graft.api.Memo.reset()
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            // ... and a SYNCHRONOUS full GC so every timed run starts
            // from a compact old gen. r11 measured all three protocols
            // on annotate_corr (solo JVM, sf1, min-of-3): no-GC 154 s,
            // 16g heap 24.6 s, unpersist+System.gc() at 100g ≈ the r9
            // 10.6 s class — without between-run GC, G1's old gen fills
            // with promoted object-agg garbage and every later
            // allocation-heavy query pays mixed-collection stalls
            // (the r11 sweep's +13.5% "regression" cluster). The r10
            // pathology was ONLY the -XX:+ExplicitGCInvokesConcurrent
            // flag (run_bench.sh) making this call CONCURRENT so its
            // work bled into the next timed window; the default STW
            // System.gc() completes before t0.
            System.gc()
          }
        }
        // a failed query must NOT flatter the total with its fail-fast
        // time — record the sentinel -1 and exclude it from the sum
        val best = if (times.exists(_ < 0)) -1.0 else times.min
        // progress to stderr so a long (sf1-scale) run is monitorable
        System.err.println(f"[bench] $name%s ${best}%.2f s")
        name -> best
      }
    // SPARK_GRAFT_BENCH_PROTOCOL=full (builder-side only) appends two
    // extra per-query fields to the FULL_OUT map (r7 verdict items 4+5;
    // the driver's stdout line stays scalar suite numbers):
    //  - isolated: min-of-5 consecutive cold runs for the known
    //    suite-load drift set — committed next to the suite number so
    //    verdicts stop re-measuring drift query by query;
    //  - warm: for the memoized iteration families, one run consuming
    //    an already-built state — the documented cluster pattern (the
    //    caller persists Lloyd/Louvain/PQ/Harmony state and fans out);
    //    cold stays the headline suite number.
    val extras: Map[String, Map[String, Double]] =
      if (!sys.env.get("SPARK_GRAFT_BENCH_PROTOCOL").contains("full")) Map.empty
      else {
        def timed(name: String): Double = {
          val t0 = System.nanoTime()
          try { SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        }
        def cold(name: String): Double = {
          graft.api.Memo.reset(); spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc() // same compact-old-gen start as the suite loop
          timed(name)
        }
        // r10 verdict item 5: the isolated re-measure set is DATA-DRIVEN,
        // not a hand-kept list — SPARK_GRAFT_BENCH_PREV names the previous
        // round's committed full map; any query whose suite number moved
        // >50% in either direction gets an isolated min-of-5 re-measure.
        // Without PREV (first round / local iteration) fall back to the
        // r9 hand list so the field never silently disappears.
        // r14 verdict item 4: drift auto-isolation must be STANDING, not
        // env-wired — r14's four no-iso offenders happened because PREV
        // pointed at the driver wrapper (different suite environment) for
        // one run. When PREV is unset, a full-protocol run auto-discovers
        // the newest committed builder full map in cwd; the explicit env
        // var still wins (sf1/sf3 sweeps compare against their own band).
        val prevPath: Option[String] =
          sys.env.get("SPARK_GRAFT_BENCH_PREV").orElse(discoverPrev())
        val prevMap: Map[String, Double] =
          prevPath.map { p =>
            parsePrev(java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
          }.getOrElse(Map.empty)
        prevPath.filterNot(_ => sys.env.contains("SPARK_GRAFT_BENCH_PREV"))
          .foreach(p => System.err.println(
            s"[bench] PREV auto-discovered: $p (${prevMap.size} queries)"))
        if (sys.env.contains("SPARK_GRAFT_BENCH_PREV")) {
          System.err.println(s"[bench] PREV map parsed: ${prevMap.size} queries")
          // r12 ADVICE: an explicitly-set PREV that parses to zero
          // queries means a format the widened regex still misses —
          // the silent hand-list fallback is the exact failure this
          // machinery exists to prevent (it burned the r12 sf1 sweep).
          // Fail hard so the sweep is rerun with a fixed parser instead
          // of committing a map with a degraded drift set.
          require(prevMap.nonEmpty,
            s"SPARK_GRAFT_BENCH_PREV set (${sys.env("SPARK_GRAFT_BENCH_PREV")}) " +
              "but zero queries parsed — fix the PREV parser or unset PREV")
        }
        val driftSet: Seq[String] =
          if (prevMap.nonEmpty)
            results.collect { case (n, t)
              if t > 0 && prevMap.get(n).exists(p =>
                p > 0 && (t / p > 1.5 || p / t > 1.5)) => n }
          else Seq("annotate_corr", "dsir_weights_hashed",
            "winnow_dup_pairs", "fuzzy_blocked_join", "dedup_cluster_sizes",
            "classifier_eval", "golden_record", "acf_daily")
        val memoSet = Seq("kmeans_clusters", "kmeans_elbow",
          "cluster_transitions", "mahalanobis_outliers", "louvain_knn",
          "louvain_knn_lsh", "leiden_refine", "modularity_score",
          "harmony_correct", "harmony_mixing", "ann_pq_topk",
          "ann_ivf_topk", "ann_ivf_sq_topk", "ann_ivfpq_topk",
          "ann_ivfpq_residual_topk", "bpe_train_deep", "bpe_vocab_inventory")
        val present = (n: String) =>
          SparkEntry.queries.contains(n) && !skip.contains(n) &&
            only.forall(_.contains(n))
        val iso = driftSet.filter(present).map { n =>
          n -> Map("isolated" -> (1 to 5).map(_ => cold(n)).min)
        }
        val warm = memoSet.filter(present).map { n =>
          cold(n) // untimed state build; next run rides the memo
          n -> Map("warm" -> timed(n))
        }
        graft.api.Memo.reset(); spark.catalog.clearCache()
        (iso ++ warm).groupBy(_._1)
          .map { case (n, vs) => n -> vs.map(_._2).reduce(_ ++ _) }
      }
    // the driver captures only the LAST 2000 chars of stdout and parses
    // the JSON line out of that tail — round 1's full-precision line was
    // ~2600 chars, got truncated mid-line, and the round recorded
    // parsed:null. 2 decimals (10 ms resolution) keeps the whole line +
    // sbt's trailing [success] banner inside the 2000-char window with
    // headroom for ~60 per-query entries.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).filter(_ >= 0).sum
    // hard cap: if the per-query map would push the line past the tail
    // window, drop the FASTEST queries from the map (never from the
    // total) until it fits — a complete-but-parseable line beats a
    // complete-but-truncated one. Failed queries (-1) always stay.
    def render(rs: Seq[(String, Double)], dropped: Int = 0): String = {
      val qs = rs.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      // when the stdout cap forced per-query drops, the line itself says
      // where the full map lives (r13 verdict item 10: BENCH_r13's tail
      // silently lost dedup_minhash_lsh; a reader of the driver artifact
      // alone had no pointer to the untruncated file)
      val note = if (dropped > 0)
        s""","dropped":$dropped,"full_map":"BENCH_full_latest.json"""" else ""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs$note,"sf":"$sfDir"}"""
    }
    // full, untruncated per-query map to a file: the driver's 1850-char
    // stdout tail drops the fastest queries (r5 lost ~118 of 194), which
    // made round-over-round regression diffs depend on which queries
    // happened to be slow — the builder commits this file each round.
    // Queries with PROTOCOL=full extras render as objects
    // {"suite": s, "isolated": i, "warm": w}; tools/bench_diff.py reads
    // the suite field as the comparable number.
    def renderFull(rs: Seq[(String, Double)]): String = {
      val qs = rs.sortBy(_._1).map { case (k, v) =>
        extras.get(k) match {
          case Some(m) =>
            val fields = (Seq("suite" -> v) ++ m.toSeq.sortBy(_._1))
              .map { case (f, x) => "\"" + f + "\":" + r3(x) }.mkString(",")
            "\"" + k + "\":{" + fields + "}"
          case None => "\"" + k + "\":" + r3(v)
        }
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // ALWAYS written (r11 verdict item 5): the driver's stdout tail has
    // a ~1850-char cap that silently drops the fastest per-query entries
    // from the committed line (BENCH_r11 lost mnn_correct); the full
    // untruncated map lands in a file in the repo cwd on EVERY run —
    // driver rounds included — so the builder can commit it verbatim.
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL_OUT",
      "BENCH_full_latest.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(fullOut), renderFull(results))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write full map to $fullOut: $e") }
    val maxLen = 1850
    var kept = results
    var line = render(kept)
    var undroppable = false
    while (!undroppable && line.length > maxLen && kept.nonEmpty) {
      kept.filter(_._2 >= 0).minByOption(_._2).map(_._1) match {
        case Some(name) =>
          System.err.println(s"[bench] line over $maxLen chars: dropping $name from per-query map (still in total)")
          kept = kept.filterNot(_._1 == name)
          line = render(kept, dropped = results.size - kept.size)
        case None =>
          // only failed (-1) entries remain — they must stay visible, so
          // accept the long line rather than emptying the map
          undroppable = true
      }
    }
    println(line)
    spark.stop()
  }
}
