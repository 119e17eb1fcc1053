package graft.sc

import graft.Tables
import graft.core.Stats
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-cell-analog analytics (SURVEY.md §2.2).
  *
  * The reference computes these over a cell×gene matrix; we compute the
  * identical statistics over the long-format analog (entity = l_orderkey
  * ≈ cell, feature = l_partkey ≈ gene, value = l_quantity ≈ count,
  * batch = o_orderpriority ≈ assay batch). Every operator is a
  * declarative plan: partial aggregation map-side, exact percentiles via
  * tiny per-batch aggregates broadcast-joined back (never a window sort
  * over a giant partition), p-values in log space as pure codegen'd
  * Column arithmetic (Stats.lgammaCol — no UDF, no lookup join).
  *
  * Reference provenance (file:line): qc wrapper.R:78-117 (metrics),
  * wrapper.R:148-220 (MAD outliers), wrapper.R:223-252 (feature filter),
  * reference.R:157-160 (log-normalize), compare_annotation.R:18-48
  * (deltas), compare_annotation.R:57-113 (combine),
  * compare_annotation.R:144-201 (threshold tally), integrate.R:188-266
  * (diversity), funx_enrichment.R:19-158 (ORA), wrapper.R:254-257
  * (module score), integrate.R:19-44 (variance explained),
  * wrapper.R:259-264 (mean-variance / HVG), integrate.R:51-181 (batch
  * standardize), slingshot.R/tradeseq.R (pseudotime association).
  */
object SingleCell {

  private def r(c: Column, d: Int): Column = round(c, d)

  /** Long-format expression matrix: entity × feature × value.
    * Aggregated because (orderkey, partkey) can repeat across lines. */
  private def matrix(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("entity"), col("l_partkey").as("feature"))
      .agg(sum(col("l_quantity")).as("value"))

  private val matrixSql =
    """SELECT l_orderkey AS entity, l_partkey AS feature,
       sum(l_quantity) AS value
       FROM lineitem GROUP BY l_orderkey, l_partkey"""

  // ---------------------------------------------------------------
  // 14. per-entity QC metrics (wrapper.R:78-117): total counts, #features
  // detected, percent-of-counts in a feature subset (mito/ribo analog =
  // features with key ≡ 0 mod 10). Single shuffle on the entity key.
  def qcCellMetrics(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.cellMetrics(Tables.lineitem(s, dir),
        col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        pmod(col("l_partkey"), lit(10)) === 0)
      .select(col("entity"), r(col("total"), 4).as("total"), col("detected"),
        r(col("pct_subset"), 6).as("pct_subset"))

  // ---------------------------------------------------------------
  // 15. MAD outlier flags per batch (wrapper.R:148-220): nmads=3 rule on
  // log1p totals, scater-style (MAD scaled by 1.4826). Exact per-batch
  // median/MAD are computed as TINY aggregates (|batches| rows) and
  // broadcast-joined back — no giant-partition window sort, so this
  // holds at 100 TB (swap percentile→percentile_approx there if exact
  // medians are not contractual).
  def qcMadOutliers(s: SparkSession, dir: String): DataFrame = {
    val totals = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("tot"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority").as("batch")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("entity"), col("batch"), log1p(col("tot")).as("lx"))
    graft.api.Analytics.madOutliers(totals, "batch", "lx", nmads = 3.0)
      .select(col("entity"), col("batch"), r(col("lx"), 6).as("lx"),
        col("outlier"), col("outlier_low"))
  }

  // ---------------------------------------------------------------
  // 16. feature filter (wrapper.R:223-252): keep features detected in
  // ≥ min #entities or ≥ min %entities. The entity total is a scalar
  // aggregate broadcast into the plan.
  def featureFilter(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.featureFilter(matrix(s, dir), col("entity"), col("feature"),
        minCount = 5, minFrac = 0.02)
      .select(col("feature"), col("n_detected"), col("keep"))

  // ---------------------------------------------------------------
  // 17. log-normalize (reference.R:157-160): CPM-style counts-per-10k
  // log1p. Per-entity totals via one extra partial agg + shuffle on
  // entity (already the matrix partitioning — reused).
  def logNormalize(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.logNormalize(matrix(s, dir),
        col("entity"), col("feature"), col("value"))
      .select(col("entity"), col("feature"), r(col("lognorm"), 6).as("lognorm"))

  private val logNormSql =
    s"""SELECT entity, feature,
        round(ln(1 + value / sum(value) OVER (PARTITION BY entity) * 10000), 6) AS lognorm
        FROM ($matrixSql)"""

  // ---------------------------------------------------------------
  // 18/19. annotation deltas (compare_annotation.R:18-48): score matrix =
  // entity × label (sum of extendedprice per returnflag-label); per
  // entity the winning label's score minus the row median (delta_med)
  // and minus the runner-up (delta_next). Label cardinality is tiny so
  // the per-entity window partitions are bounded (≤ #labels rows).
  def annotationDeltas(s: SparkSession, dir: String): DataFrame = {
    val scores = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("entity"), col("l_returnflag").as("label"))
      .agg(sum(col("l_extendedprice")).as("score"))
    graft.api.Analytics.annotationDeltas(scores, col("entity"), col("label"), col("score"))
      .select(col("entity"), col("top_label"), r(col("score"), 4).as("score"),
        r(col("delta_med"), 4).as("delta_med"), r(col("delta_next"), 4).as("delta_next"))
  }

  // ---------------------------------------------------------------
  // 20. combine two annotation methods (compare_annotation.R:57-113):
  // method1 = argmax label by revenue, method2 = argmax by quantity;
  // agreement keeps the label, disagreement → "Ambiguous".
  // Single scan + single shuffle: both score sums come from one
  // groupBy; the two argmax windows and the final per-entity rollup all
  // share the entity partitioning, so Catalyst reuses one exchange
  // (was: two scans, two shuffles, one join).
  def annotationCombine(s: SparkSession, dir: String): DataFrame = {
    // r15 optimization (guide §2.4): the two winner picks are pure
    // argmaxes — min(struct(−v, label)) reproduces the (v desc, label
    // asc) rank-1 row with map-side partial aggregation instead of two
    // window sorts (the cohens_kappa rewrite). Same total order.
    val winners = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("entity"), col("l_returnflag").as("label"))
      .agg(sum(col("l_extendedprice")).as("v1"), sum(col("l_quantity")).as("v2"))
      .groupBy(col("entity"))
      .agg(min(struct((-col("v1")).as("nv"), col("label").as("l"))).as("a1"),
        min(struct((-col("v2")).as("nv"), col("label").as("l"))).as("a2"))
      .select(col("entity"), col("a1.l").as("label_m1"), col("a2.l").as("label_m2"))
    winners.withColumn("final_label",
      when(col("label_m1") === col("label_m2"), col("label_m1")).otherwise(lit("Ambiguous")))
  }

  // ---------------------------------------------------------------
  // 21. quantile-threshold robust filter + tally
  // (compare_annotation.R:144-201): per-metric q25 thresholds, entity
  // passes iff ALL metrics ≥ threshold; tally of pass/fail. Thresholds
  // are a 1-row aggregate broadcast via crossJoin.
  def thresholdTally(s: SparkSession, dir: String): DataFrame = {
    val metrics = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("entity"))
      .agg(sum(col("l_quantity")).as("total"),
        countDistinct(col("l_partkey")).cast("double").as("detected"))
    val thr = metrics.agg(
      Stats.quantileCol(col("total"), 0.25).as("t_total"),
      Stats.quantileCol(col("detected"), 0.25).as("t_detected"))
    metrics.crossJoin(broadcast(thr))
      .select(col("entity"),
        (col("total") >= col("t_total") && col("detected") >= col("t_detected")).as("pass"),
        r(col("t_total"), 6).as("t_total"), r(col("t_detected"), 6).as("t_detected"))
      .groupBy(col("pass"), col("t_total"), col("t_detected"))
      .agg(count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------
  // 22. label×group diversity (integrate.R:188-266): crosstab row
  // proportions, then per-label coefficient of variation across groups.
  def labelGroupDiversity(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.labelGroupCv(Tables.customer(s, dir),
        col("c_nationkey"), col("c_mktsegment"))
      .select(col("label"), col("n_groups"), r(col("cv"), 6).as("cv"))

  // ---------------------------------------------------------------
  // 23. inverse-Simpson diversity per group (integrate.R:239-266,
  // LISI-like): 1 / Σ p_i² over label proportions within each group.
  def inverseSimpson(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.inverseSimpson(Tables.customer(s, dir),
        col("c_nationkey"), col("c_mktsegment"))
      .select(col("grp"), col("n_total"), r(col("inv_simpson"), 6).as("inv_simpson"))

  // ---------------------------------------------------------------
  // 24. over-representation analysis (funx_enrichment.R:19-158):
  // hypergeometric upper-tail p per term (term = p_brand gene-set,
  // hits = parts appearing in returned lineitems), computed entirely in
  // log space with Stats.lnChoose (codegen'd Stirling lgamma — no UDF),
  // then Benjamini-Hochberg adjust. The per-term tail sum explodes a
  // bounded sequence (≤ min(K,n) terms) — term table is tiny relative
  // to the fact scan that produced the hit set.
  def enrichmentOra(s: SparkSession, dir: String): DataFrame = {
    val hits = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 50)
      .select(col("l_partkey")).distinct()
    graft.api.Analytics.enrichmentOra(
        Tables.part(s, dir), col("p_brand"), col("p_partkey"),
        hits, col("l_partkey"))
      .select(col("term"), col("n_universe"), col("k_term"), col("n_hits"), col("k_hits"),
        r(col("p_value"), 6).as("p_value"), r(col("p_adj"), 6).as("p_adj"))
  }

  // ---------------------------------------------------------------
  // 25. module score (wrapper.R:254-257): mean log-normalized expression
  // of a feature set minus mean of the control set, per entity. Part
  // attributes arrive via a broadcast dim join.
  def moduleScore(s: SparkSession, dir: String): DataFrame = {
    val lognorm = graft.api.Analytics.logNormalize(matrix(s, dir),
      col("entity"), col("feature"), col("value"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_size"))),
        col("feature") === col("p_partkey"))
    graft.api.Analytics.moduleScore(lognorm, col("entity"), col("lognorm"),
        col("p_size") <= 10, col("p_size") > 10)
      .select(col("entity"), r(col("module_score"), 6).as("module_score"))
  }

  // ---------------------------------------------------------------
  // 293. TF-activity inference by univariate linear model — the
  // deterministic distributed analog of the reference's BITFAM wrapper
  // (/root/reference/R/bitfam.R:3-13: per-cell transcription-factor
  // activities from normalized expression × a TF→target prior).
  // BITFAM's variational Bayes has no deterministic distributed
  // replay; the standard fast substitute is decoupleR's ulm — per
  // (entity, TF) the t-statistic of the univariate OLS of the
  // entity's expression profile on the TF's binary target mask. The
  // Pearson core is computed from SPARSE sums only (Σx, Σx², Σx·m
  // over observed entries + universe/target counts — the zeros of the
  // dense matrix never materialize), so the whole activity matrix is
  // one fact shuffle + a |TFs|-row broadcast. Brands play the TF
  // target sets (the enrichment_ora term convention).
  def tfActivityUlm(s: SparkSession, dir: String): DataFrame = {
    // ln is scanned twice (entity moments + target sums) but is
    // deliberately NOT persisted inside the lazy plan: measured slower
    // at bench SF (2.36 → 2.99 s — the checkpoint write outweighs the
    // duplicate scan), the lshTopK signature-table precedent. At
    // corpus scale the CALLER persists the normalized matrix once.
    val ln = graft.api.Analytics.logNormalize(matrix(s, dir),
      col("entity"), col("feature"), col("value"))
    val tfs = Tables.part(s, dir)
      .select(col("p_partkey").as("feature"), col("p_brand").as("tf"))
    val nUniv = tfs.count() // bounded dim scalar (|parts|)
    val nTgt = tfs.groupBy(col("tf")).agg(count(lit(1)).as("n_targets"))
    val entStats = ln.groupBy(col("entity"))
      .agg(sum(col("lognorm")).as("sx"),
        sum(col("lognorm") * col("lognorm")).as("sxx"))
    val sxm = ln.join(broadcast(tfs), "feature")
      .groupBy(col("entity"), col("tf")).agg(sum(col("lognorm")).as("sxm"))
    val bigN = lit(nUniv.toDouble)
    entStats.crossJoin(broadcast(nTgt))
      .join(sxm, Seq("entity", "tf"), "left")
      .select(col("entity"), col("tf"), col("n_targets"), col("sx"), col("sxx"),
        coalesce(col("sxm"), lit(0.0)).as("sxm"))
      .withColumn("den", sqrt(
        (bigN * col("n_targets").cast("double")
          - (col("n_targets") * col("n_targets")).cast("double"))
          * (bigN * col("sxx") - col("sx") * col("sx"))))
      .withColumn("rr", when(col("den") > 0,
        (bigN * col("sxm") - col("n_targets").cast("double") * col("sx")) / col("den"))
        .otherwise(lit(0.0)))
      .select(col("entity"), col("tf"), col("n_targets"),
        round(col("rr"), 6).as("r"),
        round(when(abs(col("rr")) < 1,
          col("rr") * sqrt((bigN - 2.0) / (lit(1.0) - col("rr") * col("rr"))))
          .otherwise(lit(0.0)), 4).as("activity_t"))
  }

  private val tfActivityUlmSql =
    s"""WITH lognorm AS (
         SELECT entity, feature,
                ln(1 + value / sum(value) OVER (PARTITION BY entity) * 10000) AS lognorm
         FROM ($matrixSql)),
       tfm AS MATERIALIZED (SELECT p_partkey AS feature, p_brand AS tf FROM part),
       ntg AS MATERIALIZED (SELECT tf, count(*) AS n_targets FROM tfm GROUP BY 1),
       nuv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS bn FROM part),
       es AS MATERIALIZED (
         SELECT entity, sum(lognorm) AS sx, sum(lognorm * lognorm) AS sxx
         FROM lognorm GROUP BY 1),
       sxm AS MATERIALIZED (
         SELECT l.entity, t.tf, sum(l.lognorm) AS sxm
         FROM lognorm l JOIN tfm t USING (feature) GROUP BY 1, 2),
       j AS (
         SELECT e.entity, g.tf, g.n_targets, e.sx, e.sxx,
                coalesce(m.sxm, 0.0) AS sxm, n.bn
         FROM es e CROSS JOIN ntg g CROSS JOIN nuv n
         LEFT JOIN sxm m ON m.entity = e.entity AND m.tf = g.tf),
       sc AS (
         SELECT entity, tf, n_targets,
                CASE WHEN sqrt((bn * CAST(n_targets AS DOUBLE)
                         - CAST(n_targets * n_targets AS DOUBLE))
                         * (bn * sxx - sx * sx)) > 0
                     THEN (bn * sxm - CAST(n_targets AS DOUBLE) * sx)
                          / sqrt((bn * CAST(n_targets AS DOUBLE)
                              - CAST(n_targets * n_targets AS DOUBLE))
                              * (bn * sxx - sx * sx))
                     ELSE 0.0 END AS rr,
                bn
         FROM j)
       SELECT entity, tf, n_targets, round(rr, 6) AS r,
              round(CASE WHEN abs(rr) < 1
                    THEN rr * sqrt((bn - 2.0) / (1.0 - rr * rr))
                    ELSE 0.0 END, 4) AS activity_t
       FROM sc"""

  // ---------------------------------------------------------------
  // 26. variance explained per covariate (integrate.R:19-44): per-feature
  // one-way ANOVA R² of value vs batch covariate = SS_between/SS_total.
  // Two-level aggregation — no window, two shuffles total.
  def varianceExplained(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority").as("grp")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.varianceExplained(x, col("l_partkey"), col("grp"), col("l_quantity"))
      .select(col("feature"), col("n_all"), r(col("r2"), 6).as("r2"))
  }

  // ---------------------------------------------------------------
  // 27. mean-variance / highly-variable features (wrapper.R:259-264):
  // per-feature mean + variance of log-normalized expression, ranked by
  // (rounded) variance. NOTE the global rank window: feature cardinality
  // is the gene-analog (~10⁴-10⁶) so a single-partition sort is
  // acceptable even at 100 TB of matrix entries; the heavy reduction
  // happened in the groupBy.
  def hvgMeanVar(s: SparkSession, dir: String): DataFrame = {
    val lognorm = graft.api.Analytics.logNormalize(matrix(s, dir),
      col("entity"), col("feature"), col("value"))
    val stats = lognorm.groupBy(col("feature"))
      .agg(count(lit(1)).as("n"), r(avg(col("lognorm")), 6).as("mean_ln"),
        r(var_pop(col("lognorm")), 6).as("var_ln"))
    val wRank = Window.orderBy(col("var_ln").desc, col("feature").asc)
    stats.withColumn("hvg_rank", row_number().over(wRank).cast("long"))
      .withColumn("is_hvg", col("hvg_rank") <= 50)
  }

  // ---------------------------------------------------------------
  // 28. per-batch standardization (integrate.R:51-181 re-expressed):
  // z-score each value against its batch's mean/stddev. Batch moments
  // are a tiny aggregate broadcast back — the fact table is touched in
  // one pass + one broadcast join, no shuffle of the fact rows at all.
  def batchStandardize(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority").as("batch")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("batch"), col("l_quantity").as("x"))
    graft.api.Analytics.batchStandardize(x, "batch", col("x"))
      .select(col("l_orderkey"), col("l_linenumber"), col("batch"), r(col("z"), 6).as("z"))
  }

  // ---------------------------------------------------------------
  // 31. pseudotime-association test (slingshot.R/tradeseq.R analog):
  // per-feature Pearson correlation of expression vs pseudotime order
  // (order date). Single shuffle on feature; corr is one-pass.
  def pseudotimeAssoc(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.orderedAssociation(x, col("l_partkey"),
        unix_timestamp(col("o_orderdate")).cast("double"), col("l_quantity"))
      .select(col("feature"), col("n"), r(col("assoc"), 6).as("assoc"))
  }

  // ---------------------------------------------------------------
  // 102. per-feature OLS association with inference (tradeseq.R's
  // associationTest analog, fitted properly): slope/intercept/R²/t/p
  // of expression vs pseudotime in years (year units keep slope
  // magnitudes O(0.1) so 6dp rounding is meaningful). One aggregation
  // pass — see Analytics.groupedOls.
  def trajectoryOls(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.groupedOls(x, col("l_partkey"),
        unix_timestamp(col("o_orderdate")).cast("double") / lit(31557600.0),
        col("l_quantity"))
      .select(col("feature"), col("n").cast("long").as("n"),
        r(col("slope"), 6).as("slope"), r(col("intercept"), 6).as("intercept"),
        r(col("r2"), 6).as("r2"), r(col("t_stat"), 6).as("t_stat"),
        r(col("p_value"), 6).as("p_value"), r(col("p_adj"), 6).as("p_adj"))
  }

  // ---------------------------------------------------------------
  // 103. per-feature Spearman association (tie-robust monotone twin of
  // #31; slingshot pseudotime correlations are rank-based in spirit).
  def spearmanAssoc(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.spearmanAssociation(x, col("l_partkey"),
        unix_timestamp(col("o_orderdate")).cast("double"), col("l_quantity"))
      // + 0.0 normalizes IEEE signed zero: a rho that rounds to -0.0
      // formats as "-0" in one engine and "0" in the other (sf0.1
      // sweep caught exactly this); NULL + 0.0 stays NULL
      .select(col("feature"), col("n"), (r(col("rho"), 6) + lit(0.0)).as("rho"))
  }

  // ---------------------------------------------------------------
  // 105. Shannon entropy + evenness of the label mix per group
  // (integrate.R:188-266 diversity screen — the log-scale companion of
  // #23 inverse_simpson).
  def entropyByGroup(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.shannonEntropy(Tables.customer(s, dir),
        col("c_nationkey"), col("c_mktsegment"))
      .select(col("group").as("nation_key"), col("n"), col("n_labels"),
        r(col("entropy"), 6).as("entropy"), r(col("evenness"), 6).as("evenness"))

  // ---------------------------------------------------------------
  // 54 (beyond inventory). quantile normalization of the expression
  // matrix: per-entity ranks replaced by cross-entity rank means.
  def quantileNormalizeMatrix(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.quantileNormalize(matrix(s, dir),
        col("entity"), col("feature"), col("value"))
      .select(col("entity"), col("feature"), col("value"),
        r(col("qnorm"), 6).as("qnorm"))

  // ---------------------------------------------------------------
  // 56 (beyond inventory). regress out a continuous covariate
  // (order-date pseudotime) from expression, per feature — the
  // "regress out unwanted variation" step, OLS per feature in one
  // aggregate pass broadcast back.
  def regressOutMatrix(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.regressOut(x, col("l_partkey"),
        unix_timestamp(col("o_orderdate")).cast("double") / 1e9, col("l_quantity"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        r(col("residual"), 6).as("residual"))
  }

  // ---------------------------------------------------------------
  // 146. Kruskal–Wallis across the 5 priority groups per feature — the
  // k-group rank test scran::findMarkers needs when clusters > 2
  // (multi-cluster generalization of #68 de_wilcoxon).
  def kruskalWallisQuery(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.kruskalWallis(x, col("l_partkey"),
        col("o_orderpriority"), col("l_quantity"))
      // h_stat ships UNROUNDED: it is bit-identical across engines by
      // construction (ordered fold), and as a near-decimal rational it
      // has no safe rounding precision
      .select(col("feature"), col("n"), col("k_groups"), col("h_stat"),
        r(col("p_value"), 6).as("p_value"), r(col("p_adj"), 6).as("p_adj"))
  }

  private val kruskalWallisSql = {
    val qPos = graft.core.Stats.normalUpperTailSql("zz")
    val qNeg = graft.core.Stats.normalUpperTailSql("-zz")
    s"""WITH x AS (
         SELECT l_partkey AS feature, o_orderpriority AS grp, l_quantity AS v
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       cells AS (
         SELECT feature, v, grp, CAST(count(*) AS DOUBLE) AS cg
         FROM x GROUP BY 1, 2, 3),
       ranked AS (
         SELECT feature, grp, cg,
                sum(cg) OVER (PARTITION BY feature, v) AS cnt,
                sum(cg) OVER (PARTITION BY feature ORDER BY v ASC
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM cells),
       by_group AS (
         SELECT feature, grp, sum(cg) AS n_g,
                sum(cg * (cum - (cnt - 1.0) / 2.0)) AS r_g
         FROM ranked GROUP BY 1, 2),
       folded AS (
         SELECT feature, sum(n_g) AS n, count(*) AS k_groups,
                list_reduce(list_prepend(0.0, list(r_g*r_g/n_g ORDER BY grp)),
                  (a, b) -> a + b) AS sum_r2n
         FROM by_group GROUP BY 1),
       ties AS (
         SELECT feature, sum(cnt*cnt*cnt - cnt) AS tie
         FROM (SELECT feature, v, sum(cg) AS cnt FROM cells GROUP BY 1, 2)
         GROUP BY 1),
       stats AS (
         SELECT folded.feature, n, k_groups, sum_r2n, tie
         FROM folded JOIN ties ON folded.feature = ties.feature),
       scored AS (
         SELECT feature, n, k_groups,
                (12.0 / (n * (n + 1.0)) * sum_r2n - 3.0 * (n + 1.0))
                  / nullif(1.0 - tie / (n*n*n - n), 0.0) AS hc,
                CAST(k_groups - 1 AS DOUBLE) AS dof
         FROM stats),
       z AS (
         SELECT *, (cbrt(hc/dof) - (1.0 - 2.0/(9.0*dof))) / sqrt(2.0/(9.0*dof)) AS zz
         FROM scored WHERE dof > 0 AND hc IS NOT NULL),
       p AS (
         SELECT feature, n, k_groups, hc,
                coalesce(least(1.0,
                  CASE WHEN zz >= 0 THEN $qPos ELSE 1.0 - $qNeg END), 0.0) AS p_value
         FROM z),
       ranked_p AS (
         SELECT *, row_number() OVER (ORDER BY p_value ASC, feature ASC) AS rk,
                count(*) OVER () AS m
         FROM p)
       SELECT feature, CAST(n AS BIGINT) AS n, k_groups,
              hc AS h_stat, round(p_value, 6) AS p_value,
              round(least(1.0, min(p_value*m/rk) OVER (ORDER BY rk ASC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS p_adj
       FROM ranked_p"""
  }

  // ---------------------------------------------------------------
  // 142. HVG by trend ratio (scran::modelGeneVar's shape, with a
  // binned-median trend standing in for the loess — wrapper.R:259-264's
  // denoised-PCA input): per-feature mean/variance, 20 fixed-width bins
  // over ln(mean), per-bin MEDIAN variance as the technical trend,
  // biological signal = variance/trend, top-200 flagged. Mean/variance
  // are rounded to 6dp BEFORE binning/ratio so both engines bin and
  // rank identical doubles (engine ulp in avg() would otherwise flip
  // boundary bins). Feature-sized tables throughout; the rank window
  // is the bounded bhAdjust class.
  def hvgTrend(s: SparkSession, dir: String): DataFrame = {
    val stats = matrix(s, dir)
      .groupBy(col("feature"))
      .agg(count(lit(1)).as("n"), r(avg(col("value")), 6).as("mean"),
        r(var_samp(col("value")), 6).as("variance"))
      .filter(col("n") >= 2 && col("variance").isNotNull)
      .withColumn("lm", log(col("mean")))
    val rng = stats.agg(min(col("lm")).as("__mn"), max(col("lm")).as("__mx"))
    val binned = stats.crossJoin(broadcast(rng))
      .withColumn("bin", when(col("__mx") > col("__mn"), least(lit(19),
        floor((col("lm") - col("__mn")) / (col("__mx") - col("__mn")) * 20)
          .cast("int"))).otherwise(lit(0)))
    val trend = binned.groupBy(col("bin"))
      .agg(graft.core.Stats.medianCol(col("variance")).as("trend"))
    val wRank = Window.orderBy(col("ratio").desc, col("feature").asc)
    binned.join(broadcast(trend), "bin")
      .withColumn("ratio", r(col("variance") / col("trend"), 6))
      .withColumn("is_hvg", row_number().over(wRank) <= 200)
      .select(col("feature"), col("n"), col("mean"), col("variance"),
        r(col("trend"), 6).as("trend"), col("ratio"), col("is_hvg"))
  }

  private val hvgTrendSql =
    s"""WITH m AS ($matrixSql),
        stats AS (
          SELECT feature, count(*) AS n, round(avg(value), 6) AS mean,
                 round(var_samp(value), 6) AS variance
          FROM m GROUP BY 1),
        s2 AS (
          SELECT feature, n, mean, variance, ln(mean) AS lm
          FROM stats WHERE n >= 2 AND variance IS NOT NULL),
        rng AS (SELECT min(lm) AS mn, max(lm) AS mx FROM s2),
        binned AS (
          SELECT s2.*, CASE WHEN mx > mn THEN least(19,
                   CAST(floor((lm - mn) / (mx - mn) * 20) AS INT))
                 ELSE 0 END AS bin
          FROM s2, rng),
        trend AS (
          SELECT bin, median(variance) AS trend FROM binned GROUP BY 1),
        scored AS (
          SELECT feature, n, mean, variance, trend,
                 round(variance / trend, 6) AS ratio
          FROM binned JOIN trend USING (bin))
        SELECT feature, n, mean, variance, round(trend, 6) AS trend, ratio,
               row_number() OVER (ORDER BY ratio DESC, feature ASC) <= 200
                 AS is_hvg
        FROM scored"""

  // ---------------------------------------------------------------
  // 141. deterministic downsample-to-depth (DropletUtils::
  // downsampleCounts / scuttle's equal-depth normalization next to the
  // CPM path, reference.R:157-160): scale every entity's counts to a
  // common target depth and round by LARGEST REMAINDER so each
  // downsampled entity sums exactly to the target — deterministic
  // (no multinomial RNG), cluster-invariant, and exactly mirrored by
  // the oracle since every step is IEEE-exact arithmetic on integers.
  // One shuffle on entity; all three windows share the partitioning.
  def downsampleCounts(s: SparkSession, dir: String): DataFrame = {
    val target = 50L
    val wE = Window.partitionBy(col("entity"))
    val wR = Window.partitionBy(col("entity"))
      .orderBy((col("scaled") - col("base")).desc, col("feature").asc)
    matrix(s, dir)
      .withColumn("tot", sum(col("value")).over(wE))
      .filter(col("tot") >= target)
      .withColumn("scaled", col("value") * target / col("tot"))
      .withColumn("base", floor(col("scaled")))
      .withColumn("extra", lit(target) - sum(col("base")).over(wE))
      .withColumn("rk", row_number().over(wR))
      .select(col("entity"), col("feature"),
        (col("base") + when(col("rk") <= col("extra"), lit(1)).otherwise(lit(0)))
          .cast("long").as("ds_count"))
  }

  private val downsampleCountsSql =
    s"""WITH m AS ($matrixSql),
        t AS (
          SELECT entity, feature, value,
                 sum(value) OVER (PARTITION BY entity) AS tot
          FROM m),
        f AS (
          SELECT entity, feature, value * 50 / tot AS scaled,
                 floor(value * 50 / tot) AS base
          FROM t WHERE tot >= 50),
        r AS (
          SELECT entity, feature, base,
                 50 - sum(base) OVER (PARTITION BY entity) AS extra,
                 row_number() OVER (PARTITION BY entity
                   ORDER BY scaled - base DESC, feature ASC) AS rk
          FROM f)
        SELECT entity, feature,
               CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
                 AS ds_count
        FROM r"""

  // ---------------------------------------------------------------
  // 140. two-covariate regress-out (integrate.R:51-181 vars.to.regress
  // with several variables): per-feature OLS on (order date, order
  // total) jointly, residuals via the broadcast Cramer solve.
  def regressOut2Matrix(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.regressOut2(x, col("l_partkey"),
        unix_timestamp(col("o_orderdate")).cast("double") / 1e9,
        col("o_totalprice") / 1000.0, col("l_quantity"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        r(col("residual"), 6).as("residual"))
  }

  private val regressOut2Sql =
    """WITH x AS (
         SELECT l_orderkey, l_linenumber, l_partkey,
                CAST(epoch(o_orderdate) AS DOUBLE)/1e9 AS x1,
                o_totalprice/1000.0 AS x2, l_quantity AS y
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       coef AS (
         SELECT l_partkey,
                var_pop(x1) AS s11, var_pop(x2) AS s22,
                covar_pop(x1, x2) AS s12,
                covar_pop(x1, y) AS s1y, covar_pop(x2, y) AS s2y,
                avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my
         FROM x GROUP BY 1)
       SELECT x.l_orderkey, x.l_linenumber, x.l_partkey,
              round(CASE WHEN (s11*s22 - s12*s12) IS NULL
                           OR (s11*s22 - s12*s12) <= 0 THEN y - my
                    ELSE y - my
                      - ((s1y*s22 - s2y*s12)/(s11*s22 - s12*s12))*(x1 - m1)
                      - ((s2y*s11 - s1y*s12)/(s11*s22 - s12*s12))*(x2 - m2)
                    END, 6) AS residual
       FROM x JOIN coef ON x.l_partkey = coef.l_partkey"""

  // ---------------------------------------------------------------
  // 63 (beyond inventory). marker detection / differential expression
  // (marker*.R gene sets + wrapper.R:267-348 clustering → what
  // separates a group): per-feature Welch t of the URGENT batch vs the
  // rest, log2FC, normal-approx two-sided p (Stats.normalUpperTail),
  // BH adjust. One agg pass; stats table is feature-sized.
  // ---------------------------------------------------------------
  // 122. start-vs-end trajectory contrast (tradeseq.R:43-129
  // run_de_tests_tradeseq's startVsEndTest analog): per feature, Welch
  // t of values in the EARLIEST 10% of the time axis vs the LATEST 10%.
  // Tail cutoffs are pure integer arithmetic on the broadcast day range
  // (mn + (mx−mn) div 10) — range-based like value_per_bin's bins, so
  // there is no interpolated-quantile boundary to disagree on. Reuses
  // the deMarkers aggregation (one pass over the tail rows).
  def startVsEnd(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("day", expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400"))
    val range = x.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val tagged = x.crossJoin(broadcast(range))
      .withColumn("early", col("day") <= expr("mn + (mx - mn) div 10"))
      .withColumn("late", col("day") >= expr("mx - (mx - mn) div 10"))
      .filter(col("early") || col("late"))
    graft.api.Analytics.deMarkers(tagged, col("l_partkey"), col("early"),
        col("l_quantity"))
      .select(col("feature"), col("n_a"), col("n_b"),
        r(col("mean_a"), 6).as("mean_a"), r(col("mean_b"), 6).as("mean_b"),
        r(col("log2fc"), 6).as("log2fc"), r(col("t_stat"), 6).as("t_stat"),
        r(col("p_value"), 6).as("p_value"), r(col("p_adj"), 6).as("p_adj"))
  }

  def deMarkersQuery(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.deMarkers(x, col("l_partkey"),
        col("o_orderpriority") === "1-URGENT", col("l_quantity"))
      .select(col("feature"), col("n_a"), col("n_b"),
        r(col("mean_a"), 6).as("mean_a"), r(col("mean_b"), 6).as("mean_b"),
        r(col("log2fc"), 6).as("log2fc"), r(col("t_stat"), 6).as("t_stat"),
        r(col("p_value"), 6).as("p_value"), r(col("p_adj"), 6).as("p_adj"))
  }

  // ---------------------------------------------------------------
  // 68 (beyond inventory). Wilcoxon rank-sum DE — the nonparametric
  // default of scran::findMarkers. Ranks accumulate over DISTINCT
  // (feature, value) tie groups, so the window partitions are value-
  // cardinality sized, never raw-row sized.
  def deWilcoxonQuery(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
    graft.api.Analytics.wilcoxonMarkers(x, col("l_partkey"),
        col("o_orderpriority") === "1-URGENT", col("l_quantity"))
      .select(col("feature"), col("n"), col("n_a"),
        r(col("u_stat"), 4).as("u_stat"), r(col("z"), 6).as("z"),
        r(col("p_value"), 6).as("p_value"), r(col("p_adj"), 6).as("p_adj"))
  }

  // ---------------------------------------------------------------
  // 69 (beyond inventory). AUCell-like module activity: per entity,
  // AUC of the gene-set recovery curve over the top-50 ranked
  // features — the rank-robust alternative to the mean-based
  // module_score (same feature set: p_size ≤ 10).
  def aucModuleScoreQuery(s: SparkSession, dir: String): DataFrame = {
    val m = matrix(s, dir)
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_size"))),
        col("feature") === col("p_partkey"))
    graft.api.Analytics.aucModuleScore(m, col("entity"), col("feature"),
        col("value"), col("p_size") <= 10, topN = 50)
      .select(col("entity"), r(col("auc_score"), 6).as("auc_score"))
  }

  // ---------------------------------------------------------------
  // 70 (beyond inventory). feature-feature correlation (co-expression
  // module building block): pairwise Pearson between the 5 priority-
  // level spend profiles across customers.
  def featureCorrQuery(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("v"))
    graft.api.Analytics.featureCorr(perCust, col("o_custkey"),
        col("o_orderpriority"), col("v"),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .select(col("f1"), col("f2"), col("n_pairs"), r(col("pearson"), 6).as("pearson"))
  }

  // ---------------------------------------------------------------
  // 74. term grouping by similarity + threshold
  // (funx_enrichment.R:174-234): pairwise Jaccard between term member
  // sets (term = p_name word, members = parts carrying it), edges at
  // J ≥ 0.08, connected components → term group (min term id). The
  // pair space is |terms|² with terms in the dozens — the inverted
  // index join is bounded by construction.
  def termGroupsQuery(s: SparkSession, dir: String): DataFrame = {
    val membership = Tables.part(s, dir)
      .select(explode(split(col("p_name"), " ")).as("term"), col("p_partkey"))
      .distinct()
    val sizes = membership.groupBy(col("term")).agg(count(lit(1)).as("n"))
    val inter = membership.as("a").hint("shuffle_hash")
      .join(membership.as("b").hint("shuffle_hash"),
        col("a.p_partkey") === col("b.p_partkey") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("t1"), col("b.term").as("t2"))
      .agg(count(lit(1)).as("i"))
    val pairs = inter
      .join(sizes.select(col("term").as("t1"), col("n").as("n1")), "t1")
      .join(sizes.select(col("term").as("t2"), col("n").as("n2")), "t2")
      .withColumn("jac", col("i").cast("double") / (col("n1") + col("n2") - col("i")))
      .filter(col("jac") >= 0.08)
    graft.api.Similarity.connectedComponents(pairs, col("t1"), col("t2"))
      .select(col("vertex").as("term"), col("component").as("group_id"))
  }

  // ---------------------------------------------------------------
  // KL divergence of each nation's segment composition vs the global
  // composition (distribution-shift / batch-effect screen — the
  // directed counterpart of the inverse-Simpson diversity check).
  // Three bounded-key aggregations, global totals broadcast.
  def klMktsegment(s: SparkSession, dir: String): DataFrame = {
    val seg = Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val nat = seg.groupBy(col("c_nationkey")).agg(sum(col("n")).as("n_tot"))
    val gl = seg.groupBy(col("c_mktsegment")).agg(sum(col("n")).as("g"))
    val gtot = gl.agg(sum(col("g")).as("g_tot"))
    seg.join(nat, "c_nationkey").join(broadcast(gl), "c_mktsegment")
      .crossJoin(broadcast(gtot))
      .groupBy(col("c_nationkey").as("nation"),
        col("n_tot").cast("long").as("n_customers"))
      .agg(r(sum((col("n") / col("n_tot")) *
        log((col("n") / col("n_tot")) / (col("g") / col("g_tot")))), 6).as("kl_div"))
  }

  // ---------------------------------------------------------------
  // Pairwise two-sample KS tests between group value-distributions
  // (slingshot.R:113 pairwise_ks_test). D = sup|ECDF₁−ECDF₂| computed
  // WITHOUT outer joins: every (group,value) count is tagged into each
  // pair it belongs to, re-aggregated, and the running ECDF gap is a
  // per-pair window over distinct values. This EXACT form is the
  // oracle twin only — on continuous values its per-pair partitions
  // approach |rows|, so it is Bench-quarantined (the dedup_ngram_
  // jaccard convention); the benched scale path is pairwiseKsBinned
  // below, whose partitions are ≤ KsBins by construction. p is the
  // one-term asymptotic bound 2·exp(−2·m·D²), m = n₁n₂/(n₁+n₂) — the
  // deterministic contract both engines compute identically.
  def pairwiseKs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(s, dir)
      .groupBy(col("event_type").as("t"), col("value")).agg(count(lit(1)).as("c"))
    val types = counts.select(col("t")).distinct()
    val pairs = types.select(col("t").as("t1"))
      .crossJoin(types.select(col("t").as("t2"))).filter(col("t1") < col("t2"))
    val totals = counts.groupBy(col("t")).agg(sum(col("c")).as("n"))
    val tagged = broadcast(pairs)
      .join(counts, col("t") === col("t1") || col("t") === col("t2"))
      .groupBy(col("t1"), col("t2"), col("value"))
      .agg(sum(when(col("t") === col("t1"), col("c")).otherwise(0L)).as("c1"),
        sum(when(col("t") === col("t2"), col("c")).otherwise(0L)).as("c2"))
    val w = Window.partitionBy(col("t1"), col("t2")).orderBy(col("value").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("r1", sum(col("c1")).over(w))
      .withColumn("r2", sum(col("c2")).over(w))
      .join(broadcast(totals.select(col("t").as("t1"), col("n").as("n1"))), "t1")
      .join(broadcast(totals.select(col("t").as("t2"), col("n").as("n2"))), "t2")
      .groupBy(col("t1"), col("t2"), col("n1"), col("n2"))
      .agg(max(abs(col("r1") / col("n1") - col("r2") / col("n2"))).as("d"))
      .select(col("t1"), col("t2"), col("n1"), col("n2"), r(col("d"), 6).as("ks_d"),
        r(least(lit(1.0), lit(2.0) * exp(lit(-2.0) * (col("n1") * col("n2") /
          (col("n1") + col("n2"))) * col("d") * col("d"))), 6).as("p_asym"))
  }

  // ---------------------------------------------------------------
  // Scale path of the KS screen above (the heaps_fit precedent made
  // explicit): pre-bin values into KsBins fixed-width bins over the
  // broadcast global [min, max] BEFORE the pair tagging, so the
  // per-pair ECDF window partitions hold ≤ KsBins rows no matter how
  // continuous the value column is — the exact form's partitions
  // approach |rows| per pair on continuous data, which is why THIS is
  // the benched path and the exact form is the quarantined oracle
  // twin. The binned D is the exact sup over bin right-edges; it
  // under-reads the true D by at most the largest single-bin
  // probability mass (spec-pinned vs the exact form on real data).
  // Bin assignment is one shared-arithmetic expression both engines
  // compute identically in IEEE doubles (the value_per_bin contract).
  private val KsBins = 256

  def pairwiseKsBinned(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val rng = ev.agg(min(col("value")).as("vmn"), max(col("value")).as("vmx"))
    val counts = ev.crossJoin(broadcast(rng))
      .withColumn("bin", when(col("vmn") === col("vmx"), lit(0L)).otherwise(
        least(floor((col("value") - col("vmn")) * lit(KsBins.toDouble)
          / (col("vmx") - col("vmn"))), lit((KsBins - 1).toLong))))
      .groupBy(col("event_type").as("t"), col("bin")).agg(count(lit(1)).as("c"))
    val types = counts.select(col("t")).distinct()
    val pairs = types.select(col("t").as("t1"))
      .crossJoin(types.select(col("t").as("t2"))).filter(col("t1") < col("t2"))
    val totals = counts.groupBy(col("t")).agg(sum(col("c")).as("n"))
    val tagged = broadcast(pairs)
      .join(counts, col("t") === col("t1") || col("t") === col("t2"))
      .groupBy(col("t1"), col("t2"), col("bin"))
      .agg(sum(when(col("t") === col("t1"), col("c")).otherwise(0L)).as("c1"),
        sum(when(col("t") === col("t2"), col("c")).otherwise(0L)).as("c2"))
    val w = Window.partitionBy(col("t1"), col("t2")).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("r1", sum(col("c1")).over(w))
      .withColumn("r2", sum(col("c2")).over(w))
      .join(broadcast(totals.select(col("t").as("t1"), col("n").as("n1"))), "t1")
      .join(broadcast(totals.select(col("t").as("t2"), col("n").as("n2"))), "t2")
      .groupBy(col("t1"), col("t2"), col("n1"), col("n2"))
      .agg(max(abs(col("r1") / col("n1") - col("r2") / col("n2"))).as("d"))
      .select(col("t1"), col("t2"), col("n1"), col("n2"), r(col("d"), 6).as("ks_d"),
        r(least(lit(1.0), lit(2.0) * exp(lit(-2.0) * (col("n1") * col("n2") /
          (col("n1") + col("n2"))) * col("d") * col("d"))), 6).as("p_asym"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pairwise_ks"           -> (pairwiseKs _),
    "pairwise_ks_binned"    -> (pairwiseKsBinned _),
    "kl_mktsegment"         -> (klMktsegment _),
    "term_groups"           -> (termGroupsQuery _),
    "de_wilcoxon"           -> (deWilcoxonQuery _),
    "auc_module_score"      -> (aucModuleScoreQuery _),
    "feature_corr"          -> (featureCorrQuery _),
    "de_markers"            -> (deMarkersQuery _),
    "regress_out"           -> (regressOutMatrix _),
    "regress_out2"          -> (regressOut2Matrix _),
    "downsample_counts"     -> (downsampleCounts _),
    "hvg_trend"             -> (hvgTrend _),
    "kruskal_wallis"        -> (kruskalWallisQuery _),
    "quantile_normalize"    -> (quantileNormalizeMatrix _),
    "qc_cell_metrics"       -> (qcCellMetrics _),
    "qc_mad_outliers"       -> (qcMadOutliers _),
    "feature_filter"        -> (featureFilter _),
    "log_normalize"         -> (logNormalize _),
    "annotation_deltas"     -> (annotationDeltas _),
    "annotation_combine"    -> (annotationCombine _),
    "threshold_tally"       -> (thresholdTally _),
    "label_group_diversity" -> (labelGroupDiversity _),
    "inverse_simpson"       -> (inverseSimpson _),
    "enrichment_ora"        -> (enrichmentOra _),
    "module_score"          -> (moduleScore _),
    "tf_activity_ulm"       -> (tfActivityUlm _),
    "variance_explained"    -> (varianceExplained _),
    "hvg_mean_var"          -> (hvgMeanVar _),
    "batch_standardize"     -> (batchStandardize _),
    "pseudotime_assoc"      -> (pseudotimeAssoc _),
    "trajectory_ols"        -> (trajectoryOls _),
    "spearman_assoc"        -> (spearmanAssoc _),
    "entropy_by_group"      -> (entropyByGroup _),
    "start_vs_end"          -> (startVsEnd _))

  val oracles: Map[String, String] = Map(
    "start_vs_end" -> {
      val q = graft.core.Stats.normalUpperTailSql("abs(t_stat)")
      s"""WITH x0 AS (
           SELECT l_partkey AS feature, l_quantity AS x,
                  CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         rng AS (SELECT min(day) AS mn, max(day) AS mx FROM x0),
         x AS (
           SELECT feature, x, day <= mn + (mx - mn) // 10 AS a
           FROM x0, rng
           WHERE day <= mn + (mx - mn) // 10 OR day >= mx - (mx - mn) // 10),
         s AS (
           SELECT feature,
                  count(CASE WHEN a THEN 1 END) AS n_a,
                  count(CASE WHEN NOT a THEN 1 END) AS n_b,
                  avg(CASE WHEN a THEN x END) AS mean_a,
                  avg(CASE WHEN NOT a THEN x END) AS mean_b,
                  var_samp(CASE WHEN a THEN x END) AS var_a,
                  var_samp(CASE WHEN NOT a THEN x END) AS var_b
           FROM x GROUP BY 1),
         scored AS (
           SELECT feature, n_a, n_b, mean_a, mean_b,
                  log2((mean_a + 1.0)/(mean_b + 1.0)) AS log2fc,
                  (mean_a - mean_b)/nullif(sqrt(var_a/n_a + var_b/n_b), 0.0) AS t_stat
           FROM s),
         p AS (
           SELECT *, coalesce(least(1.0, 2.0 * $q), 1.0) AS p_value FROM scored),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY p_value ASC, feature ASC) AS rk,
                  count(*) OVER () AS m
           FROM p)
         SELECT feature, n_a, n_b, round(mean_a,6) AS mean_a,
                round(mean_b,6) AS mean_b, round(log2fc,6) AS log2fc,
                round(t_stat,6) AS t_stat, round(p_value,6) AS p_value,
                round(least(1.0, min(p_value*m/rk) OVER (ORDER BY rk ASC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),6) AS p_adj
         FROM ranked"""
    },
    "trajectory_ols" -> {
      val q = graft.core.Stats.normalUpperTailSql("abs(t_stat)")
      s"""WITH x AS (
           SELECT l_partkey AS feature,
                  CAST(epoch(o_orderdate) AS DOUBLE)/31557600.0 AS xv,
                  l_quantity AS yv
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         s AS (
           SELECT feature,
                  regr_count(yv, xv) AS n,
                  regr_slope(yv, xv) AS slope,
                  regr_intercept(yv, xv) AS intercept,
                  regr_r2(yv, xv) AS r2,
                  regr_sxx(yv, xv) AS sxx,
                  regr_syy(yv, xv) AS syy,
                  regr_sxy(yv, xv) AS sxy
           FROM x GROUP BY 1),
         scored AS (
           SELECT feature, n, slope, intercept, r2,
                  slope / nullif(sqrt((syy - sxy*sxy/nullif(sxx, 0.0))
                                      / (n - 2.0) / nullif(sxx, 0.0)), 0.0) AS t_stat
           FROM s),
         p AS (
           SELECT *, coalesce(least(1.0, 2.0 * $q), 1.0) AS p_value FROM scored),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY p_value ASC, feature ASC) AS rk,
                  count(*) OVER () AS m
           FROM p)
         SELECT feature, CAST(n AS BIGINT) AS n, round(slope,6) AS slope,
                round(intercept,6) AS intercept, round(r2,6) AS r2,
                round(t_stat,6) AS t_stat, round(p_value,6) AS p_value,
                round(least(1.0, min(p_value*m/rk) OVER (ORDER BY rk ASC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),6) AS p_adj
         FROM ranked"""
    },
    "spearman_assoc" ->
      """WITH x AS (
           SELECT l_partkey AS feature, CAST(epoch(o_orderdate) AS DOUBLE) AS xv,
                  l_quantity AS yv
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         r0 AS (
           SELECT feature, xv, yv,
                  row_number() OVER (PARTITION BY feature ORDER BY xv ASC) AS rx0,
                  row_number() OVER (PARTITION BY feature ORDER BY yv ASC) AS ry0
           FROM x),
         a AS (
           SELECT feature,
                  avg(rx0) OVER (PARTITION BY feature, xv) AS rx,
                  avg(ry0) OVER (PARTITION BY feature, yv) AS ry
           FROM r0)
         SELECT feature, count(*) AS n, round(corr(rx, ry), 6) + 0 AS rho
         FROM a GROUP BY 1""",
    "entropy_by_group" ->
      """WITH c AS (
           SELECT c_nationkey AS nation_key, c_mktsegment AS l, count(*) AS cnt
           FROM customer GROUP BY 1, 2)
         SELECT nation_key, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS n_labels,
                round(ln(sum(cnt)) - sum(cnt*ln(cnt))/sum(cnt), 6) AS entropy,
                CASE WHEN count(*) > 1
                     THEN round((ln(sum(cnt)) - sum(cnt*ln(cnt))/sum(cnt))
                                / ln(count(*)), 6) END AS evenness
         FROM c GROUP BY 1""",
    "pairwise_ks" ->
      """WITH counts AS (
           SELECT event_type AS t, value, count(*) AS c FROM events GROUP BY 1, 2),
         types AS (SELECT DISTINCT t FROM counts),
         pairs AS (SELECT a.t AS t1, b.t AS t2 FROM types a, types b WHERE a.t < b.t),
         totals AS (SELECT t, sum(c) AS n FROM counts GROUP BY 1),
         tagged AS (
           SELECT p.t1, p.t2, c.value,
                  sum(CASE WHEN c.t = p.t1 THEN c.c ELSE 0 END) AS c1,
                  sum(CASE WHEN c.t = p.t2 THEN c.c ELSE 0 END) AS c2
           FROM pairs p JOIN counts c ON c.t = p.t1 OR c.t = p.t2
           GROUP BY 1, 2, 3),
         run AS (
           SELECT t1, t2, value,
                  sum(c1) OVER (PARTITION BY t1, t2 ORDER BY value ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
                  sum(c2) OVER (PARTITION BY t1, t2 ORDER BY value ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
           FROM tagged),
         d AS (
           SELECT r.t1, r.t2, n1.n AS n1, n2.n AS n2,
                  max(abs(r.r1 / n1.n - r.r2 / n2.n)) AS d
           FROM run r JOIN totals n1 ON r.t1 = n1.t JOIN totals n2 ON r.t2 = n2.t
           GROUP BY 1, 2, 3, 4)
         SELECT t1, t2, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                round(d, 6) AS ks_d,
                round(least(1.0, 2.0 * exp(-2.0 * (n1 * n2 / (n1 + n2)) * d * d)), 6) AS p_asym
         FROM d""",
    "pairwise_ks_binned" ->
      """WITH rng AS (SELECT min(value) AS vmn, max(value) AS vmx FROM events),
         counts AS MATERIALIZED (
           SELECT event_type AS t,
                  CASE WHEN vmn = vmx THEN 0
                       ELSE least(CAST(floor((value - vmn) * 256.0 / (vmx - vmn)) AS BIGINT), 255)
                  END AS bin,
                  count(*) AS c
           FROM events, rng GROUP BY 1, 2),
         types AS (SELECT DISTINCT t FROM counts),
         pairs AS (SELECT a.t AS t1, b.t AS t2 FROM types a, types b WHERE a.t < b.t),
         totals AS (SELECT t, sum(c) AS n FROM counts GROUP BY 1),
         tagged AS (
           SELECT p.t1, p.t2, c.bin,
                  sum(CASE WHEN c.t = p.t1 THEN c.c ELSE 0 END) AS c1,
                  sum(CASE WHEN c.t = p.t2 THEN c.c ELSE 0 END) AS c2
           FROM pairs p JOIN counts c ON c.t = p.t1 OR c.t = p.t2
           GROUP BY 1, 2, 3),
         run AS (
           SELECT t1, t2, bin,
                  sum(c1) OVER (PARTITION BY t1, t2 ORDER BY bin ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
                  sum(c2) OVER (PARTITION BY t1, t2 ORDER BY bin ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
           FROM tagged),
         d AS (
           SELECT r.t1, r.t2, n1.n AS n1, n2.n AS n2,
                  max(abs(r.r1 / n1.n - r.r2 / n2.n)) AS d
           FROM run r JOIN totals n1 ON r.t1 = n1.t JOIN totals n2 ON r.t2 = n2.t
           GROUP BY 1, 2, 3, 4)
         SELECT t1, t2, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                round(d, 6) AS ks_d,
                round(least(1.0, 2.0 * exp(-2.0 * (n1 * n2 / (n1 + n2)) * d * d)), 6) AS p_asym
         FROM d""",
    "kl_mktsegment" ->
      """WITH seg AS (
           SELECT c_nationkey, c_mktsegment, count(*) AS n FROM customer GROUP BY 1, 2),
         nat AS (SELECT c_nationkey, sum(n) AS n_tot FROM seg GROUP BY 1),
         gl AS (SELECT c_mktsegment, sum(n) AS g FROM seg GROUP BY 1),
         gtot AS (SELECT sum(g) AS g_tot FROM gl)
         SELECT seg.c_nationkey AS nation, CAST(nat.n_tot AS BIGINT) AS n_customers,
                round(sum((seg.n / nat.n_tot) * ln((seg.n / nat.n_tot) / (gl.g / gtot.g_tot))), 6) AS kl_div
         FROM seg JOIN nat USING (c_nationkey) JOIN gl USING (c_mktsegment), gtot
         GROUP BY 1, 2""",
    "term_groups" ->
      """WITH RECURSIVE membership AS (
           SELECT DISTINCT unnest(string_split(p_name, ' ')) AS term, p_partkey
           FROM part),
         sizes AS (SELECT term, count(*) AS n FROM membership GROUP BY 1),
         inter AS (
           SELECT a.term AS t1, b.term AS t2, count(*) AS i
           FROM membership a JOIN membership b
             ON a.p_partkey = b.p_partkey AND a.term < b.term
           GROUP BY 1, 2),
         pairs AS (
           SELECT t1, t2 FROM inter
           JOIN sizes s1 ON t1 = s1.term
           JOIN sizes s2 ON t2 = s2.term
           WHERE CAST(i AS DOUBLE)/(s1.n + s2.n - i) >= 0.08),
         edges AS (SELECT t1 AS a, t2 AS b FROM pairs
                   UNION SELECT t2, t1 FROM pairs),
         reach AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         verts AS (SELECT DISTINCT a AS vertex FROM edges)
         SELECT v.vertex AS term,
                least(v.vertex, min(r.b)) AS group_id
         FROM verts v LEFT JOIN reach r ON v.vertex = r.a
         GROUP BY v.vertex""",
    "de_wilcoxon" -> {
      val q = graft.core.Stats.normalUpperTailSql("abs(z)")
      s"""WITH x AS (
           SELECT l_partkey AS feature, o_orderpriority = '1-URGENT' AS a,
                  l_quantity AS v
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         vals AS (
           SELECT feature, v, CAST(count(*) AS DOUBLE) AS cnt,
                  sum(CASE WHEN a THEN 1.0 ELSE 0.0 END) AS cnt_a
           FROM x GROUP BY 1, 2),
         ranked AS (
           SELECT *, sum(cnt) OVER (PARTITION BY feature ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM vals),
         r2 AS (SELECT *, cum - (cnt - 1.0)/2.0 AS avg_rank FROM ranked),
         stats AS (
           SELECT feature, sum(cnt) AS n, sum(cnt_a) AS n_a,
                  sum(cnt_a * avg_rank) AS r_a,
                  sum(cnt*cnt*cnt - cnt) AS tie_term
           FROM r2 GROUP BY 1),
         scored AS (
           SELECT feature, n, n_a,
                  r_a - n_a*(n_a + 1.0)/2.0 AS u_stat,
                  CASE WHEN r_a - n_a*(n_a + 1.0)/2.0 > n_a*(n - n_a)/2.0
                       THEN r_a - n_a*(n_a + 1.0)/2.0 - n_a*(n - n_a)/2.0 - 0.5
                       WHEN r_a - n_a*(n_a + 1.0)/2.0 < n_a*(n - n_a)/2.0
                       THEN r_a - n_a*(n_a + 1.0)/2.0 - n_a*(n - n_a)/2.0 + 0.5
                       ELSE 0.0 END
                  / nullif(sqrt(n_a*(n - n_a)/12.0 *
                      ((n + 1.0) - tie_term/(n*(n - 1.0)))), 0.0) AS z
           FROM stats),
         p AS (
           SELECT *, coalesce(least(1.0, 2.0 * $q), 1.0) AS p_value FROM scored),
         rankedp AS (
           SELECT *, row_number() OVER (ORDER BY p_value ASC, feature ASC) AS rk,
                  count(*) OVER () AS m
           FROM p)
         SELECT feature, CAST(n AS BIGINT) AS n, CAST(n_a AS BIGINT) AS n_a,
                round(u_stat,4) AS u_stat, round(z,6) AS z,
                round(p_value,6) AS p_value,
                round(least(1.0, min(p_value*m/rk) OVER (ORDER BY rk ASC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),6) AS p_adj
         FROM rankedp"""
    },
    "auc_module_score" ->
      s"""WITH m AS ($matrixSql),
          j AS (
            SELECT entity, feature, value, p_size <= 10 AS inset
            FROM m JOIN part ON feature = p_partkey),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY entity
              ORDER BY value DESC, feature ASC) AS rnk
            FROM j)
          SELECT entity,
                 round(coalesce(
                   sum(CASE WHEN inset AND rnk <= 50 THEN 51.0 - rnk END)
                   / (least(sum(CASE WHEN inset THEN 1.0 END), 50.0) * 50.0),
                   0.0), 6) AS auc_score
          FROM ranked GROUP BY entity""",
    "feature_corr" ->
      """WITH perc AS (
           SELECT o_custkey, o_orderpriority AS f, sum(o_totalprice) AS v
           FROM orders GROUP BY 1, 2)
         SELECT a.f AS f1, b.f AS f2, count(*) AS n_pairs,
                round(corr(a.v, b.v), 6) + 0 AS pearson
         FROM perc a JOIN perc b
           ON a.o_custkey = b.o_custkey AND a.f < b.f
         GROUP BY 1, 2""",
    "de_markers" -> {
      val q = graft.core.Stats.normalUpperTailSql("abs(t_stat)")
      s"""WITH x AS (
           SELECT l_partkey AS feature, o_orderpriority = '1-URGENT' AS a,
                  l_quantity AS x
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         s AS (
           SELECT feature,
                  count(CASE WHEN a THEN 1 END) AS n_a,
                  count(CASE WHEN NOT a THEN 1 END) AS n_b,
                  avg(CASE WHEN a THEN x END) AS mean_a,
                  avg(CASE WHEN NOT a THEN x END) AS mean_b,
                  var_samp(CASE WHEN a THEN x END) AS var_a,
                  var_samp(CASE WHEN NOT a THEN x END) AS var_b
           FROM x GROUP BY 1),
         scored AS (
           SELECT feature, n_a, n_b, mean_a, mean_b,
                  log2((mean_a + 1.0)/(mean_b + 1.0)) AS log2fc,
                  (mean_a - mean_b)/nullif(sqrt(var_a/n_a + var_b/n_b), 0.0) AS t_stat
           FROM s),
         p AS (
           SELECT *, coalesce(least(1.0, 2.0 * $q), 1.0) AS p_value FROM scored),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY p_value ASC, feature ASC) AS rk,
                  count(*) OVER () AS m
           FROM p)
         SELECT feature, n_a, n_b, round(mean_a,6) AS mean_a,
                round(mean_b,6) AS mean_b, round(log2fc,6) AS log2fc,
                round(t_stat,6) AS t_stat, round(p_value,6) AS p_value,
                round(least(1.0, min(p_value*m/rk) OVER (ORDER BY rk ASC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),6) AS p_adj
         FROM ranked"""
    },
    "regress_out2" -> regressOut2Sql,
    "downsample_counts" -> downsampleCountsSql,
    "hvg_trend" -> hvgTrendSql,
    "kruskal_wallis" -> kruskalWallisSql,
    "regress_out" ->
      """WITH x AS (
           SELECT l_orderkey, l_linenumber, l_partkey,
                  CAST(epoch(o_orderdate) AS DOUBLE)/1e9 AS xv, l_quantity AS y
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         coef AS (
           SELECT l_partkey, regr_slope(y, xv) AS b, regr_intercept(y, xv) AS a,
                  avg(y) AS my
           FROM x GROUP BY 1)
         SELECT x.l_orderkey, x.l_linenumber, x.l_partkey,
                round(CASE WHEN b IS NULL THEN y - my
                           ELSE y - (a + b*xv) END, 6) AS residual
         FROM x JOIN coef ON x.l_partkey = coef.l_partkey""",
    "quantile_normalize" ->
      s"""WITH ranked AS (
            SELECT entity, feature, value,
                   row_number() OVER (PARTITION BY entity
                     ORDER BY value ASC, feature ASC) AS rnk
            FROM ($matrixSql)),
          rank_means AS (SELECT rnk, avg(value) AS qnorm FROM ranked GROUP BY rnk)
          SELECT entity, feature, value, round(qnorm, 6) AS qnorm
          FROM ranked JOIN rank_means USING (rnk)""",
    "qc_cell_metrics" ->
      """SELECT l_orderkey AS entity,
         round(sum(l_quantity),4) AS total,
         count(DISTINCT l_partkey) AS detected,
         round(100.0 * sum(CASE WHEN l_partkey % 10 = 0 THEN l_quantity ELSE 0.0 END)
               / sum(l_quantity), 6) AS pct_subset
         FROM lineitem GROUP BY l_orderkey""",
    "qc_mad_outliers" ->
      """WITH totals AS (
           SELECT l_orderkey AS entity, o_orderpriority AS batch,
                  ln(1 + sum(l_quantity)) AS lx
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY l_orderkey, o_orderpriority),
         med AS (SELECT batch, median(lx) AS med FROM totals GROUP BY batch),
         mad AS (SELECT t.batch, median(abs(t.lx - m.med)) AS mad
                 FROM totals t JOIN med m ON t.batch = m.batch GROUP BY t.batch)
         SELECT t.entity, t.batch, round(t.lx,6) AS lx,
                abs(t.lx - m.med) > 3*1.4826*d.mad AS outlier,
                t.lx < m.med - 3*1.4826*d.mad AS outlier_low
         FROM totals t JOIN med m ON t.batch = m.batch
         JOIN mad d ON t.batch = d.batch""",
    "feature_filter" ->
      """WITH m AS (SELECT l_orderkey AS entity, l_partkey AS feature,
                    sum(l_quantity) AS value
                    FROM lineitem GROUP BY 1,2),
         tot AS (SELECT count(DISTINCT entity) AS n_entities FROM m)
         SELECT feature, count(*) AS n_detected,
                (count(*) >= 5 OR CAST(count(*) AS DOUBLE)/max(tot.n_entities) >= 0.02) AS keep
         FROM m, tot GROUP BY feature""",
    "log_normalize" -> logNormSql,
    "annotation_deltas" ->
      """WITH scores AS (
           SELECT l_orderkey AS entity, l_returnflag AS label,
                  sum(l_extendedprice) AS score
           FROM lineitem GROUP BY 1,2),
         ranked AS (
           SELECT entity, label, score,
                  row_number() OVER (PARTITION BY entity ORDER BY score DESC, label ASC) AS rk,
                  median(score) OVER (PARTITION BY entity) AS med,
                  lead(score) OVER (PARTITION BY entity ORDER BY score DESC, label ASC) AS nxt
           FROM scores)
         SELECT entity, label AS top_label, round(score,4) AS score,
                round(score - med,4) AS delta_med,
                round(score - coalesce(nxt, 0.0),4) AS delta_next
         FROM ranked WHERE rk = 1""",
    "annotation_combine" ->
      """WITH m1 AS (
           SELECT entity, label AS label_m1 FROM (
             SELECT l_orderkey AS entity, l_returnflag AS label,
                    row_number() OVER (PARTITION BY l_orderkey
                      ORDER BY sum(l_extendedprice) DESC, l_returnflag ASC) AS rk
             FROM lineitem GROUP BY 1,2) WHERE rk = 1),
         m2 AS (
           SELECT entity, label AS label_m2 FROM (
             SELECT l_orderkey AS entity, l_returnflag AS label,
                    row_number() OVER (PARTITION BY l_orderkey
                      ORDER BY sum(l_quantity) DESC, l_returnflag ASC) AS rk
             FROM lineitem GROUP BY 1,2) WHERE rk = 1)
         SELECT m1.entity, label_m1, label_m2,
                CASE WHEN label_m1 = label_m2 THEN label_m1 ELSE 'Ambiguous' END AS final_label
         FROM m1 JOIN m2 ON m1.entity = m2.entity""",
    "threshold_tally" ->
      """WITH metrics AS (
           SELECT l_orderkey AS entity, sum(l_quantity) AS total,
                  CAST(count(DISTINCT l_partkey) AS DOUBLE) AS detected
           FROM lineitem GROUP BY l_orderkey),
         thr AS (SELECT quantile_cont(total, 0.25) AS t_total,
                        quantile_cont(detected, 0.25) AS t_detected
                 FROM metrics)
         SELECT (total >= t_total AND detected >= t_detected) AS pass,
                round(t_total,6) AS t_total, round(t_detected,6) AS t_detected,
                count(*) AS n
         FROM metrics, thr GROUP BY 1, 2, 3""",
    "label_group_diversity" ->
      """WITH counts AS (
           SELECT c_nationkey AS grp, c_mktsegment AS label, count(*) AS n
           FROM customer GROUP BY 1,2),
         props AS (
           SELECT grp, label,
                  CAST(n AS DOUBLE)/sum(n) OVER (PARTITION BY grp) AS prop
           FROM counts)
         SELECT label, count(*) AS n_groups,
                round(stddev_pop(prop)/avg(prop),6) AS cv
         FROM props GROUP BY label""",
    "inverse_simpson" ->
      """WITH counts AS (
           SELECT c_nationkey AS grp, c_mktsegment AS label, count(*) AS n
           FROM customer GROUP BY 1,2)
         SELECT grp, CAST(sum(n) AS BIGINT) AS n_total,
                round(CAST(sum(n) AS DOUBLE)*sum(n)/sum(n*n),6) AS inv_simpson
         FROM counts GROUP BY grp""",
    "enrichment_ora" ->
      """WITH hits AS (SELECT DISTINCT l_partkey FROM lineitem
                       WHERE l_returnflag = 'R' AND l_quantity >= 50),
         base AS (
           SELECT p_brand AS term,
                  count(*) AS k_term,
                  CAST(sum(CASE WHEN h.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hits,
                  (SELECT count(*) FROM part) AS n_universe,
                  (SELECT count(*) FROM hits) AS n_hits
           FROM part LEFT JOIN hits h ON p_partkey = h.l_partkey
           GROUP BY p_brand),
         tail AS (
           SELECT term, n_universe, k_term, n_hits, k_hits,
                  sum(exp(
                    (lgamma(k_term+1)-lgamma(j+1)-lgamma(k_term-j+1)) +
                    (lgamma(n_universe-k_term+1)-lgamma(n_hits-j+1)-lgamma(n_universe-k_term-(n_hits-j)+1)) -
                    (lgamma(n_universe+1)-lgamma(n_hits+1)-lgamma(n_universe-n_hits+1)))) AS p
           FROM base, LATERAL unnest(generate_series(k_hits, least(k_term, n_hits))) AS t(j)
           GROUP BY term, n_universe, k_term, n_hits, k_hits),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY p ASC, term ASC) AS rk,
                  count(*) OVER () AS m
           FROM tail)
         SELECT term, n_universe, k_term, n_hits, k_hits,
                round(p,6) AS p_value,
                round(least(1.0, min(p*m/rk) OVER (ORDER BY rk ASC
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),6) AS p_adj
         FROM ranked""",
    "tf_activity_ulm" -> tfActivityUlmSql,
    "module_score" ->
      s"""WITH lognorm AS (
            SELECT entity, feature,
                   ln(1 + value / sum(value) OVER (PARTITION BY entity) * 10000) AS lognorm
            FROM ($matrixSql))
          SELECT entity,
                 round(avg(CASE WHEN p_size <= 10 THEN lognorm END)
                     - avg(CASE WHEN p_size > 10 THEN lognorm END),6) AS module_score
          FROM lognorm JOIN part ON feature = p_partkey
          GROUP BY entity""",
    "variance_explained" ->
      """WITH x AS (
           SELECT l_partkey AS feature, o_orderpriority AS grp, l_quantity AS x
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         by_group AS (
           SELECT feature, grp, count(*) AS n_g, avg(x) AS m_g
           FROM x GROUP BY 1,2),
         overall AS (
           SELECT feature, count(*) AS n_all, avg(x) AS m_all, var_pop(x) AS v_all
           FROM x GROUP BY 1)
         SELECT g.feature, o.n_all,
                round(sum(n_g*(m_g-m_all)*(m_g-m_all)) / (n_all*nullif(v_all,0.0)),6) AS r2
         FROM by_group g JOIN overall o ON g.feature = o.feature
         GROUP BY g.feature, o.n_all, o.v_all""",
    "hvg_mean_var" ->
      s"""WITH lognorm AS (
            SELECT entity, feature,
                   ln(1 + value / sum(value) OVER (PARTITION BY entity) * 10000) AS lognorm
            FROM ($matrixSql)),
          stats AS (
            SELECT feature, count(*) AS n, round(avg(lognorm),6) AS mean_ln,
                   round(var_pop(lognorm),6) AS var_ln
            FROM lognorm GROUP BY feature)
          SELECT feature, n, mean_ln, var_ln,
                 row_number() OVER (ORDER BY var_ln DESC, feature ASC) AS hvg_rank,
                 row_number() OVER (ORDER BY var_ln DESC, feature ASC) <= 50 AS is_hvg
          FROM stats""",
    "batch_standardize" ->
      """WITH x AS (
           SELECT l_orderkey, l_linenumber, o_orderpriority AS batch, l_quantity AS x
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         moments AS (
           SELECT batch, avg(x) AS mu, stddev_pop(x) AS sigma FROM x GROUP BY batch)
         SELECT l_orderkey, l_linenumber, x.batch,
                round((x.x - mu)/nullif(sigma,0.0),6) AS z
         FROM x JOIN moments ON x.batch = moments.batch""",
    "pseudotime_assoc" ->
      """WITH x AS (
           SELECT l_partkey AS feature,
                  CAST(epoch(o_orderdate) AS DOUBLE) AS pt, l_quantity AS x
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         SELECT feature, count(*) AS n, round(corr(x, pt),6) + 0 AS assoc
         FROM x GROUP BY feature""")
}
