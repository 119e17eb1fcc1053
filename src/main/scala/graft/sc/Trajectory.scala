package graft.sc

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trajectory-inference analytics (SURVEY.md §2.9 #132-133) — the
  * slingshot/tradeseq surface beyond the per-feature association tests
  * already in SingleCell (#31, #102, #122).
  *
  * Reference provenance: slingshot.R:8-57 run_slingshot calls
  * getLineages, whose core is a minimum spanning tree over cluster
  * centroids in reduced-dim space (lineages = tree paths) —
  * cluster_mst computes that tree. tradeseq.R:43-129's patternTest
  * compares the SHAPE of two lineages' smoothed expression along the
  * time axis — pattern_diff re-expresses it as a per-bin Welch
  * contrast combined into a χ²(#bins) statistic (the same
  * analytic-in-place-of-GAM simplification start_vs_end (#122) uses
  * for startVsEndTest).
  */
object Trajectory {

  private def r(c: Column, d: Int): Column = round(c, d)

  // ---------------------------------------------------------------
  // 132. slingshot cluster MST: label centroids over the embedding
  // corpus, pairwise euclidean distances, minimum spanning tree.
  // The centroid reduction is fully distributed (one narrow pass +
  // bounded-key agg); only the |labels|² distance matrix reaches the
  // driver (labels are cluster ids — dozens at most, by construction
  // the same bound slingshot itself assumes). Prim with deterministic
  // (dist, from, to) tie-breaks; rows-only at the driver gate (MST
  // is not ANSI-SQL-expressible without recursion over argmin state),
  // semantics spec'd in ScalaTest.
  def clusterMst(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val e = Tables.embeddings(s, dir)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
    val cents = e
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim")).agg(avg(col("x")).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(dim, c))), s -> s.c)").as("cv"))
    val pairs = cents.as("a").crossJoin(broadcast(cents.as("b")))
      .filter(col("a.label") < col("b.label"))
      .select(col("a.label").as("l1"), col("b.label").as("l2"),
        sqrt(greatest(lit(0.0),
          dot(col("a.cv"), col("a.cv")) + dot(col("b.cv"), col("b.cv"))
            - lit(2.0) * dot(col("a.cv"), col("b.cv")))).as("dist"))
      .collect()
    // Prim over the tiny collected matrix (k² entries, k = #clusters)
    val verts = pairs.flatMap(p => Seq(p.getInt(0), p.getInt(1))).distinct.sorted
    val d = pairs.map(p => ((p.getInt(0), p.getInt(1)), p.getDouble(2))).toMap
    def dist(a: Int, b: Int): Double = d.getOrElse((a min b, a max b), Double.MaxValue)
    val inTree = scala.collection.mutable.Set(verts.head)
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    while (inTree.size < verts.length) {
      val (from, to, w) = (for {
        a <- verts if inTree(a)
        b <- verts if !inTree(b)
      } yield (a, b, dist(a, b))).minBy { case (a, b, w) => (w, a, b) }
      inTree += to
      edges += ((from min to, from max to, w))
    }
    import s.implicits._
    edges.toSeq.toDF("from_label", "to_label", "dist")
      .select(col("from_label"), col("to_label"), r(col("dist"), 6).as("dist"))
  }

  // ---------------------------------------------------------------
  // 133. tradeseq patternTest analog: per feature, contrast the
  // URGENT-priority lineage's binned mean-value profile along the
  // 10-bin day axis against the rest; per-bin Welch t, combined
  // χ²(#used bins) with a Wilson–Hilferty p and BH adjust. Bin edges
  // are pure integer day arithmetic (no quantile boundary to disagree
  // on); one aggregation pass over the fact join, bounded
  // (feature × bin) intermediate.
  def patternDiff(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("day", expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400"))
    val range = x.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val binned = x.crossJoin(broadcast(range))
      .withColumn("bin", expr("((day - mn) * 10) div (mx - mn + 1)"))
      .withColumn("a", col("o_orderpriority") === "1-URGENT")
    val perBin = binned.groupBy(col("l_partkey").as("feature"), col("bin"))
      .agg(count(when(col("a"), lit(1))).as("n_a"),
        avg(when(col("a"), col("l_quantity"))).as("m_a"),
        var_samp(when(col("a"), col("l_quantity"))).as("v_a"),
        count(when(!col("a"), lit(1))).as("n_b"),
        avg(when(!col("a"), col("l_quantity"))).as("m_b"),
        var_samp(when(!col("a"), col("l_quantity"))).as("v_b"))
    val se2 = col("v_a") / col("n_a") + col("v_b") / col("n_b")
    val used = col("n_a") >= 2 && col("n_b") >= 2 && se2.isNotNull && se2 > 0
    val perFeature = perBin.groupBy(col("feature"))
      .agg(count(when(used, lit(1))).as("n_bins_used"),
        sum(when(used, (col("m_a") - col("m_b")) * (col("m_a") - col("m_b"))))
          .as("pattern_dist"),
        sum(when(used, (col("m_a") - col("m_b")) * (col("m_a") - col("m_b")) / se2))
          .as("chi2"))
      .filter(col("n_bins_used") > 0)
    val dof = col("n_bins_used").cast("double")
    val z = (cbrt(col("chi2") / dof) - (lit(1.0) - lit(2.0) / (lit(9.0) * dof))) /
      sqrt(lit(2.0) / (lit(9.0) * dof))
    val pTail = when(z >= 0, graft.core.Stats.normalUpperTail(z))
      .otherwise(lit(1.0) - graft.core.Stats.normalUpperTail(-z))
    val scored = perFeature
      .withColumn("p_value", coalesce(least(lit(1.0), pTail), lit(0.0)))
    graft.api.Analytics.bhAdjust(scored, col("p_value"), col("feature"))
      .select(col("feature"), col("n_bins_used"),
        r(col("pattern_dist"), 6).as("pattern_dist"), r(col("chi2"), 6).as("chi2"),
        r(col("p_value"), 6).as("p_value"), r(col("p_adj"), 6).as("p_adj"))
  }

  private val patternDiffSql = {
    val qPos = graft.core.Stats.normalUpperTailSql("zz")
    val qNeg = graft.core.Stats.normalUpperTailSql("-zz")
    s"""WITH x AS (
         SELECT l_partkey AS feature, l_quantity AS q,
                (o_orderpriority = '1-URGENT') AS a,
                CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       rng AS (SELECT min(day) AS mn, max(day) AS mx FROM x),
       per_bin AS (
         SELECT feature, ((day - mn) * 10) // (mx - mn + 1) AS bin,
                count(CASE WHEN a THEN 1 END) AS n_a,
                avg(CASE WHEN a THEN q END) AS m_a,
                var_samp(CASE WHEN a THEN q END) AS v_a,
                count(CASE WHEN NOT a THEN 1 END) AS n_b,
                avg(CASE WHEN NOT a THEN q END) AS m_b,
                var_samp(CASE WHEN NOT a THEN q END) AS v_b
         FROM x, rng GROUP BY 1, 2),
       per_feature AS (
         SELECT feature,
                count(CASE WHEN n_a >= 2 AND n_b >= 2
                  AND (v_a/n_a + v_b/n_b) > 0 THEN 1 END) AS n_bins_used,
                sum(CASE WHEN n_a >= 2 AND n_b >= 2 AND (v_a/n_a + v_b/n_b) > 0
                  THEN (m_a - m_b)*(m_a - m_b) END) AS pattern_dist,
                sum(CASE WHEN n_a >= 2 AND n_b >= 2 AND (v_a/n_a + v_b/n_b) > 0
                  THEN (m_a - m_b)*(m_a - m_b) / (v_a/n_a + v_b/n_b) END) AS chi2
         FROM per_bin GROUP BY 1),
       kept AS (SELECT * FROM per_feature WHERE n_bins_used > 0),
       z AS (
         SELECT *, (cbrt(chi2/CAST(n_bins_used AS DOUBLE))
                    - (1.0 - 2.0/(9.0*n_bins_used)))
                   / sqrt(2.0/(9.0*n_bins_used)) AS zz
         FROM kept),
       p AS (
         SELECT feature, n_bins_used, pattern_dist, chi2,
                coalesce(least(1.0,
                  CASE WHEN zz >= 0 THEN $qPos ELSE 1.0 - $qNeg END), 0.0) AS p_value
         FROM z),
       ranked AS (
         SELECT *, row_number() OVER (ORDER BY p_value ASC, feature ASC) AS rk,
                count(*) OVER () AS m
         FROM p)
       SELECT feature, n_bins_used, round(pattern_dist, 6) AS pattern_dist,
              round(chi2, 6) AS chi2, round(p_value, 6) AS p_value,
              round(least(1.0, min(p_value*m/rk) OVER (ORDER BY rk ASC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS p_adj
       FROM ranked"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cluster_mst"  -> (clusterMst _),
    "pattern_diff" -> (patternDiff _))

  val oracles: Map[String, String] = Map(
    "pattern_diff" -> patternDiffSql)
}
