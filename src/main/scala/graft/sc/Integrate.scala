package graft.sc

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch integration by mutual nearest neighbors — the distributed
  * analog of the reference's anchor-based integration wrappers
  * (`/root/reference/R/integrate.R:51-181`: Seurat `IntegrateLayers`
  * CCA anchors + `RunHarmony`), re-expressed Spark-first after
  * Haghverdi et al. 2018 (MNN correction).
  *
  * The decomposition:
  *  - #206 `mnn_pairs`      — mutual cross-batch top-k cosine pairs
  *    (the anchors). Exact scorer = oracle path (the documented BNL
  *    shape of dedup_embedding); `mnn_pairs_lsh` is the corpus-scale
  *    twin over hyperplane-bucket candidates.
  *  - #207 `mnn_shift`      — the per-dimension batch-correction
  *    vector estimated from the anchors only (NOT from all cells:
  *    resistance to batch composition differences is the entire point
  *    of MNN over plain per-batch centering, which #28 already does).
  *  - #208 `mnn_correct`    — the shift applied to every target-batch
  *    embedding (melted to (cell, dim) rows).
  *
  * Determinism at scale: the shift accumulates integer-quantized
  * differences (round(δ·1e6) as BIGINT — the semantic_dedup centroid
  * trick), so the aggregation is order-independent and hash-exact on
  * any partitioning; the division back to double is a single IEEE op
  * both engines perform identically.
  *
  * Batches are pmod(vec_id, 2): batch 0 = reference, batch 1 = target.
  */
object Integrate {

  private def r(c: Column, d: Int): Column = round(c, d)
  import graft.functions.VectorFunctions.{dot, topKByScore, hyperplaneBucket}

  private val K = 5
  private val LshPlanes = 5 // must match sim.Ann's bucket table (shared oracle prefix)

  private def batched(s: SparkSession, dir: String): DataFrame =
    graft.api.Analytics.spread(
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("batch", pmod(col("vec_id"), lit(2)))

  /** Cross-batch scored candidates, exact: every (ref, tgt) pair. The
    * reference side broadcasts — the documented quadratic oracle shape;
    * the LSH variant below is the plan you run at corpus scale. */
  private def scoredExact(s: SparkSession, dir: String): DataFrame = {
    val vecs = batched(s, dir)
    val b0 = vecs.filter(col("batch") === 0)
      .select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val b1 = vecs.filter(col("batch") === 1)
      .select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    b1.crossJoin(broadcast(b0))
      .select(col("a"), col("b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cs"))
  }

  /** Cross-batch scored candidates via shared hyperplane buckets: the
    * target side probes its own bucket plus all hamming-1 flips (the
    * hardNegativesLsh convention), the reference side joins on the
    * bucket key — bounded fan-out, no corpus broadcast. */
  private def scoredLsh(s: SparkSession, dir: String): DataFrame = {
    val vecs = batched(s, dir)
      .withColumn("bucket", hyperplaneBucket(col("v"), LshPlanes))
    val b0 = vecs.filter(col("batch") === 0)
      .select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"),
        col("bucket"))
    val b1 = vecs.filter(col("batch") === 1)
      .select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"),
        explode(expr(s"""transform(sequence(0, $LshPlanes),
          p -> IF(p = 0, bucket, bucket ^ shiftleft(1L, p - 1)))""")).as("bucket"))
    b0.hint("shuffle_hash").join(b1.hint("shuffle_hash"), Seq("bucket"))
      .select(col("a"), col("b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cs"))
      .dropDuplicates("a", "b")
  }

  /** Mutual top-K filter over a scored candidate table: (a,b) survives
    * iff b is in a's top-K AND a is in b's top-K (score desc, id asc —
    * the total order topKByScore and the SQL windows share). */
  private def mutualTopK(scored0: DataFrame): DataFrame = {
    val scored = scored0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val topA = scored.groupBy(col("a"))
      .agg(topKByScore(col("cs"), col("b"), K).as("tk"))
      .select(col("a"), explode(col("tk")).as("e"))
      .select(col("a"), col("e.id").as("b"), col("e.score").as("cs"))
    val topB = scored.groupBy(col("b"))
      .agg(topKByScore(col("cs"), col("a"), K).as("tk"))
      .select(col("b"), explode(col("tk")).as("e"))
      .select(col("e.id").as("a"), col("b"))
    topA.join(topB, Seq("a", "b"))
      .select(col("a").as("ref_id"), col("b").as("tgt_id"), r(col("cs"), 6).as("cos_sim"))
  }

  // ---------------------------------------------------------------
  // 206. MNN anchor pairs (exact = oracle path; _lsh = scale path).
  def mnnPairs(s: SparkSession, dir: String): DataFrame =
    mutualTopK(scoredExact(s, dir))

  def mnnPairsLsh(s: SparkSession, dir: String): DataFrame =
    mutualTopK(scoredLsh(s, dir))

  // ---------------------------------------------------------------
  // 207. per-dimension batch-shift vector from the anchors: for dim d,
  // delta_d = mean over pairs of (ref_d − tgt_d), accumulated as
  // integer-quantized BIGINTs so the sum is order-independent.
  private def shiftFrom(s: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    val vecs = batched(s, dir)
    val refV = vecs.select(col("vec_id").as("ref_id"), col("v").as("va"))
    val tgtV = vecs.select(col("vec_id").as("tgt_id"), col("v").as("vb"))
    pairs.select(col("ref_id"), col("tgt_id"))
      .join(refV, "ref_id").join(tgtV, "tgt_id")
      .select(posexplode(expr(
        "zip_with(va, vb, (x, y) -> CAST(round((x - y) * 1e6, 0) AS BIGINT))"))
        .as(Seq("dim", "q")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("q")).as("sq"))
      .select(col("dim"), col("n_pairs"),
        (col("sq") / (lit(1e6) * col("n_pairs"))).as("delta"))
  }

  def mnnShift(s: SparkSession, dir: String): DataFrame =
    shiftFrom(s, dir, mnnPairs(s, dir))
      .select(col("dim"), col("n_pairs"), r(col("delta"), 6).as("delta"))

  // ---------------------------------------------------------------
  // 208. apply the shift to every target-batch cell: melted
  // (vec_id, dim, x, x_corrected). The 64-row shift table broadcasts;
  // the target batch streams through one narrow posexplode — linear,
  // shuffle-free on the fact side.
  def mnnCorrect(s: SparkSession, dir: String): DataFrame = {
    val delta = shiftFrom(s, dir, mnnPairs(s, dir)) // unrounded here; rounding is applied after the add
    batched(s, dir).filter(col("batch") === 1)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("x"))
      .join(broadcast(delta.select(col("dim"), col("delta"))), "dim")
      .select(col("vec_id"), col("dim"),
        r(col("x"), 6).as("x"), r(col("x") + col("delta"), 6).as("x_corrected"))
  }

  // ---------------------------------------------------------------
  // oracles

  private val pairsPrefixSql =
    """b0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 2 = 0),
       b1 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 2 = 1),
       scored AS MATERIALIZED (
         SELECT b0.vec_id AS a, b1.vec_id AS b,
                list_cosine_similarity(b0.v, b1.v) AS cs
         FROM b0, b1),
       ra AS (SELECT a, b, cs,
                row_number() OVER (PARTITION BY a ORDER BY cs DESC, b ASC) AS rk
              FROM scored),
       rb AS (SELECT a, b,
                row_number() OVER (PARTITION BY b ORDER BY cs DESC, a ASC) AS rk
              FROM scored),
       pairs AS (
         SELECT ra.a, ra.b, ra.cs
         FROM ra JOIN rb ON ra.a = rb.a AND ra.b = rb.b
         WHERE ra.rk <= 5 AND rb.rk <= 5)"""

  private val mnnPairsSql =
    s"""WITH $pairsPrefixSql
       SELECT a AS ref_id, b AS tgt_id, round(cs, 6) AS cos_sim FROM pairs"""

  private val mnnPairsLshSql = {
    val sigPrefix = graft.sim.Ann.lshSigPrefixSql
    s"""WITH $sigPrefix,
       tprobes AS MATERIALIZED (
         SELECT s.vec_id AS b,
                CASE WHEN t.p < 0 THEN s.bucket
                     ELSE xor(s.bucket, (1::BIGINT << t.p)) END AS bucket
         FROM lsig s, LATERAL (SELECT unnest(generate_series(-1, ${LshPlanes - 1})) AS p) t
         WHERE s.vec_id % 2 = 1),
       cand AS (
         SELECT DISTINCT s0.vec_id AS a, p.b
         FROM tprobes p JOIN lsig s0 USING (bucket)
         WHERE s0.vec_id % 2 = 0),
       scored AS MATERIALIZED (
         SELECT c.a, c.b,
                list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS cs
         FROM cand c JOIN embeddings q ON c.a = q.vec_id
                     JOIN embeddings n ON c.b = n.vec_id),
       ra AS (SELECT a, b, cs,
                row_number() OVER (PARTITION BY a ORDER BY cs DESC, b ASC) AS rk
              FROM scored),
       rb AS (SELECT a, b,
                row_number() OVER (PARTITION BY b ORDER BY cs DESC, a ASC) AS rk
              FROM scored)
       SELECT ra.a AS ref_id, ra.b AS tgt_id, round(ra.cs, 6) AS cos_sim
       FROM ra JOIN rb ON ra.a = rb.a AND ra.b = rb.b
       WHERE ra.rk <= 5 AND rb.rk <= 5"""
  }

  private val shiftPrefixSql =
    s"""$pairsPrefixSql,
       pd AS (
         SELECT t.i - 1 AS dim,
                CAST(round((av.v[t.i] - bv.v[t.i]) * 1e6, 0) AS BIGINT) AS q
         FROM pairs p
         JOIN b0 av ON p.a = av.vec_id
         JOIN b1 bv ON p.b = bv.vec_id,
         LATERAL (SELECT unnest(generate_series(1, len(av.v))) AS i) t),
       shift AS (
         SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n_pairs,
                sum(q) / (1e6 * count(*)) AS delta
         FROM pd GROUP BY 1)"""

  private val mnnShiftSql =
    s"""WITH $shiftPrefixSql
       SELECT dim, n_pairs, round(delta, 6) AS delta FROM shift"""

  private val mnnCorrectSql =
    s"""WITH $shiftPrefixSql,
       tx AS (
         SELECT vec_id, t.i - 1 AS dim, t.x
         FROM b1, LATERAL (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS i) t)
       SELECT tx.vec_id, CAST(tx.dim AS BIGINT) AS dim,
              round(tx.x, 6) AS x, round(tx.x + sh.delta, 6) AS x_corrected
       FROM tx JOIN shift sh ON tx.dim = sh.dim"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mnn_pairs"     -> (mnnPairs _),
    "mnn_pairs_lsh" -> (mnnPairsLsh _),
    "mnn_shift"     -> (mnnShift _),
    "mnn_correct"   -> (mnnCorrect _))

  val oracles: Map[String, String] = Map(
    "mnn_pairs"     -> mnnPairsSql,
    "mnn_pairs_lsh" -> mnnPairsLshSql,
    "mnn_shift"     -> mnnShiftSql,
    "mnn_correct"   -> mnnCorrectSql)
}
