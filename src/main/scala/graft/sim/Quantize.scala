package graft.sim

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ8) of the embedding corpus — the
  * storage/memory lever every corpus-scale ANN deployment pulls first
  * (faiss `SQ8`, Milvus/pgvector scalar quantization): 4 bytes/dim
  * float32 → 1 byte/dim, so a 100 TB embedding table serves from 25 TB
  * of cache, before any index structure.
  *
  * Codebook = per-dimension global [min, max] (one aggregate over the
  * corpus; at scale a 2·d-value reduce — broadcast back as a 1-row
  * attach). Code = round((x − min) / span · 255); dequantized value is
  * the code mapped back onto the span. Quantize/dequantize is pure
  * elementwise IEEE arithmetic in a fixed order, so DuckDB replays it
  * BIT-EXACTLY — the audit and the SQ-ANN query below are hash-checked
  * oracles, not rows-only specs.
  *
  *  - `embedding_quantize_audit` (#192): per-label reconstruction error
  *    (MSE, max abs error, cosine drift) — the go/no-go table you read
  *    before switching the serving path to int8.
  *  - `ann_sq_topk` (#193): asymmetric-distance brute-force top-k
  *    (full-precision query × dequantized corpus — faiss ADC). Exact
  *    baseline shape (O(q·n), documented BNL): its role is to pin the
  *    SQ scoring semantics; the corpus-scale composition is #194.
  *  - `ann_ivf_sq_topk` (#194): IVF coarse quantizer OVER the int8
  *    corpus — the faiss IVF+SQ8 recipe. Probes nprobe=4 of 16 cells,
  *    scans ~1/4 of a corpus that is itself 4× smaller in memory.
  *    Grid-Lloyd-trained (Reduce.gridLloyd, r6) → hash-checked like
  *    the rest of the SQ family; recall re-pinned in QuantizeSpec.
  */
object Quantize {

  import graft.functions.VectorFunctions.dot

  /** Corpus with the per-dim [min,max] codebook attached (1-row
    * broadcast) and the dequantized vector `vq` alongside the original
    * `v`. posexplode → 2·d-row aggregate: map-side combine collapses
    * each partition to d rows before the exchange. */
  private val dqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long, Unit), DataFrame]()
  graft.api.Memo.register(() => dqCache.clear())

  /** Memoized per (session, dir): the int8 corpus IS the persisted
    * storage layer in production (quantize once, serve many) — the
    * warm path must not re-derive it per query. localCheckpoint is
    * corpus-bounded (n x d doubles x2). */
  private def dequantized(s: SparkSession, dir: String): DataFrame =
    graft.api.Memo.stamped(dqCache, s, dir, ()) {
      dequantizedBuild(s, dir).localCheckpoint()
    }

  private def dequantizedBuild(s: SparkSession, dir: String): DataFrame = {
    val vecs = graft.api.Analytics.spread(
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v")))
    val mm = vecs.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(expr("transform(sort_array(collect_list(struct(d, mn))), s -> s.mn)").as("mins"),
        expr("transform(sort_array(collect_list(struct(d, mx))), s -> s.mx)").as("maxs"))
    vecs.crossJoin(broadcast(mm))
      .withColumn("vq", expr(
        """transform(sequence(0, size(v) - 1), i ->
          |  CASE WHEN maxs[i] = mins[i] THEN mins[i]
          |       ELSE mins[i] + round((v[i] - mins[i]) / (maxs[i] - mins[i]) * 255.0)
          |            * (maxs[i] - mins[i]) / 255.0 END)""".stripMargin))
      .drop("mins", "maxs")
  }

  // ---------------------------------------------------------------
  // 192. per-label SQ8 reconstruction audit. MSE is scaled ×1e6 before
  // the 6dp round (raw MSE ~2e-6 would vanish at 4-6dp); max abs error
  // is an order-free max of bit-identical values, safe at 9dp.
  def embeddingQuantizeAudit(s: SparkSession, dir: String): DataFrame =
    dequantized(s, dir)
      .withColumn("mse",
        expr("aggregate(zip_with(v, vq, (x, y) -> (x-y)*(x-y)), 0D, (acc, e) -> acc + e)")
          / size(col("v")))
      .withColumn("maxe",
        expr("aggregate(zip_with(v, vq, (x, y) -> abs(x-y)), 0D, (acc, e) -> greatest(acc, e))"))
      .withColumn("cs",
        dot(col("v"), col("vq"))
          / (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("vq"), col("vq")))))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("mse")) * 1e6, 6).as("avg_mse_e6"),
        round(max(col("maxe")), 9).as("max_abs_err"),
        round(avg(col("cs")), 6).as("avg_cos_sim"))

  // ---------------------------------------------------------------
  // 193. asymmetric SQ top-k: full-precision queries (every 50th
  // vector, the #37 protocol) scored against the dequantized corpus.
  def annSqTopk(s: SparkSession, dir: String): DataFrame = {
    val dq = dequantized(s, dir)
    graft.api.Similarity.bruteForceTopK(
        dq, col("vec_id"), col("vq"),
        dq.filter(pmod(col("vec_id"), lit(50)) === 0), col("vec_id"), col("v"),
        k = 10)
      .select(col("qid"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"), col("rk"))
  }

  // ---------------------------------------------------------------
  // 194. IVF over the int8 corpus (symmetric: centroids, corpus AND
  // queries all live in dequantized space — the storage-resident form).
  def annIvfSqTopk(s: SparkSession, dir: String): DataFrame =
    Ann.ivfTopkFrom(s, dir, "sq",
      dequantized(s, dir)
        .select(col("vec_id"), col("vq").as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v")))))

  // ---------------------------------------------------------------
  // 230. product quantization + ADC (Jégou et al. 2011; faiss PQ) —
  // the missing member of the quantization family (SQ8 #192-194 keeps
  // d bytes/vector; PQ keeps m SUB-vector codes: 8 codes × 4 bits here
  // = 4 bytes/vector, 64× smaller than float32; m=4/16-dim measured
  // recall@10 0.11 on this corpus, m=8 clears the ≥0.25 GraphOpsSpec
  // floor — the m-vs-memory lever). m=8 subspaces of 8 dims, 16
  // centroids per subspace trained by the SAME fixed-3-round
  // integer-grid Lloyd as IVF (vec_id mod 16 init, quantized centroid
  // sums, BIGINT d² argmin with (d2, k) total order — the
  // Reduce.gridLloyd contract keyed by subspace instead of kval, so
  // the whole train+encode+search path replays in DuckDB). ADC: each
  // query precomputes a 4×16 integer distance table (one broadcast-
  // sized frame); corpus distance = Σ_sub dtab[sub, code] — the scan
  // touches only the 4 codes per vector, never the floats. All
  // arithmetic BIGINT end to end → hash-checked.
  private val PqSubs = 8
  private val PqSubDim = 8
  private val PqK = 16

  /** PQ training state, memoized per (session, dir) — the lloydState
    * contract: (base sub-vector grid table, final codes, final
    * codebooks), each localCheckpointed; consumed by #230 and the
    * IVF+PQ composition #258. */
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long, Unit), (DataFrame, DataFrame, DataFrame)]()
  graft.api.Memo.register(() => pqCache.clear())

  private def pqState(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    graft.api.Memo.stamped(pqCache, s, dir, ()) {
      val R = graft.ml.Reduce.LloydRounds
      val base = graft.api.Analytics.spread(
          Tables.embeddings(s, dir)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
        .withColumn("sub", explode(array((0 until PqSubs).map(lit(_)): _*)))
        .select(col("vec_id"), col("sub"),
          expr(s"slice(v, sub * $PqSubDim + 1, $PqSubDim)").as("sv"))
        .withColumn("xq", expr("transform(sv, x -> CAST(round(x * 1000, 0) AS BIGINT))"))
        .localCheckpoint() // every round + the encode/query passes scan it
      // r15 optimization (the gridLloyd rewrite, guide §2.3/§2.4): the
      // code column rides the sub-vector frame, so each codebook round's
      // only exchange is the (sub, k) partial-aggregate (≤ m·PqK rows
      // after map-side combine); the corpus never re-shuffles and the
      // n·m·PqK exploded argmin exchange is a per-row fold over the
      // broadcast codebook array — bit-identical integer d² with the
      // same (d2, k) total order, so codes and oracle hashes are
      // unchanged.
      var g = base.select(col("vec_id"), col("sub"), col("sv"), col("xq"),
        pmod(col("vec_id"), lit(PqK.toLong)).as("k"))
      var cents: DataFrame = null
      for (i <- 1 to R) {
        // one checkpoint before the FINAL round (the gridLloyd note):
        // codes and codebooks materialize separately below
        if (i == R) g = g.localCheckpoint()
        // codebook phase: one native quant_vec_sum aggregate per
        // (sub, k) — bit-identical to the posexplode per-dim sums it
        // replaces, no n·m·subdim explode
        cents = g.groupBy(col("sub"), col("k"))
          .agg(graft.functions.VectorFunctions.quantVecSum(col("sv")).as("sq"),
            count(lit(1)).as("n"))
          .select(col("sub"), col("k"),
            expr("transform(sq, q -> q / (1e6 * n))").as("cv"))
          .withColumn("cq", expr("transform(cv, x -> CAST(round(x * 1000, 0) AS BIGINT))"))
        val carr = cents.groupBy(col("sub"))
          .agg(collect_list(struct(col("k"), col("cq"))).as("cents"))
        g = base.join(broadcast(carr), Seq("sub"))
          .withColumn("m", expr(
            """array_min(transform(cents, ce -> named_struct(
              |  'd2', aggregate(zip_with(xq, ce.cq, (a, b) -> (a - b) * (a - b)),
              |          0L, (s, e) -> s + e),
              |  'k', ce.k)))""".stripMargin))
          .select(col("vec_id"), col("sub"), col("sv"), col("xq"),
            col("m.k").as("k"))
      }
      (base, g.select(col("vec_id"), col("sub"), col("k")).localCheckpoint(),
        cents.localCheckpoint())
    }

  /** Per-query ADC distance tables (qid, sub, k, d2) over the final
    * codebooks — broadcast-sized (|queries| x m x PqK integers). */
  private def pqDtab(base: DataFrame, cents: DataFrame): DataFrame =
    base.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("qid"), col("sub"), col("xq").as("qxq"))
      .join(broadcast(cents.select(col("sub"), col("k"), col("cq"))), Seq("sub"))
      .select(col("qid"), col("sub"), col("k"),
        expr("aggregate(zip_with(qxq, cq, (a, b) -> (a - b) * (a - b)), 0L, (s, e) -> s + e)")
          .as("d2"))

  def annPqTopk(s: SparkSession, dir: String): DataFrame = {
    val (base, g, cents) = pqState(s, dir)
    val dtab = pqDtab(base, cents)
    // ADC max = m subs x subdim dims x (grid delta)^2 << 2^53: the -d
    // double score in the bounded-heap top-k is exact, ties by smaller
    // vec_id — the oracle's (adc asc, nid asc) total order.
    val scored = g.join(broadcast(dtab), Seq("sub", "k"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc"))
    scored.groupBy(col("qid"))
      .agg(graft.functions.VectorFunctions
        .topKByScore(-col("adc").cast("double"), col("vec_id"), 10).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("neighbor_id"),
        (-col("e.score")).cast("long").as("adc_d2"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  // ---------------------------------------------------------------
  // 258. IVF + PQ — the complete faiss IVFPQ recipe (#194 was IVF+SQ8):
  // the grid-Lloyd coarse quantizer prunes the scan to nprobe=4 of 16
  // cells, and the scan itself reads only the 4-byte PQ codes through
  // the query's ADC table. Both trainings are the shared deterministic
  // grid pipelines, so the whole composed index replays in DuckDB.
  // (Codes are over raw vectors, not residuals — the residual variant
  // needs a second codebook conditioned on the cell; documented trade.)
  def annIvfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val (base, codes, cents) = pqState(s, dir)
    val dtab = pqDtab(base, cents)
    val vecs = graft.api.Analytics.spread(
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
    val (assign, icents) = graft.ml.Reduce.gridLloydMemo(s, dir, "raw",
      Seq(Ann.IvfCells))(vecs.select(col("vec_id"), col("v")))
    val qs = vecs.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("qid"),
        expr("transform(v, x -> CAST(round(x * 1000, 0) AS BIGINT))").as("qxq"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probed = qs.crossJoin(broadcast(icents.select(col("k").as("cell"), col("cq"))))
      .withColumn("d2",
        expr("aggregate(zip_with(qxq, cq, (a, b) -> (a - b) * (a - b)), 0L, (s, e) -> s + e)"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= 4)
      .select(col("qid"), col("cell"))
    val cand = assign.select(col("vec_id"), col("k").as("cell"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val scored = cand
      .join(codes, "vec_id")
      .join(broadcast(dtab), Seq("qid", "sub", "k"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc"))
    scored.groupBy(col("qid"))
      .agg(graft.functions.VectorFunctions
        .topKByScore(-col("adc").cast("double"), col("vec_id"), 10).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("neighbor_id"),
        (-col("e.score")).cast("long").as("adc_d2"),
        (col("pos") + 1).cast("long").as("rk"))
  }


  // ---------------------------------------------------------------
  // 276. residual-encoded IVFPQ — the actual faiss IVFPQ default
  // (#258 encodes raw vectors; r6 verdict item 7): PQ codebooks are
  // trained on RESIDUALS r = v − centroid(cell), which concentrates
  // the quantizer's 16 codewords on the within-cell variance instead
  // of re-spending them on the coarse structure the IVF already
  // captured — measurably better recall at identical bytes/vector.
  // Determinism: residuals are BIGINT differences on the shared 1e-3
  // grid (xq − cq, both already quantized), residual centroids are
  // one round(sum/n) per dim, d² argmin keeps the (d2, k) total
  // order — the whole train+encode+probe+ADC path replays in DuckDB.
  // The query-side ADC table is per (query, probed cell): residual of
  // the query against THAT cell's centroid — |q|·nprobe·m·PqK rows,
  // still broadcast-sized.
  /** Residual-PQ training state, memoized per (session, dir) — the
    * persisted-index contract (same as pqState): (corpus with grid
    * codes, cell assignment, coarse centroids, residual codes, residual
    * codebooks). The r9 warm column showed this query's cost was ~all
    * training (warm 6.85 ~= suite 6.87): the state memo existed for the
    * flat-PQ path but the residual training re-ran per run. */
  private val residualCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long, Unit),
    (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)]()
  graft.api.Memo.register(() => residualCache.clear())

  private def residualState(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) =
    graft.api.Memo.stamped(residualCache, s, dir, ()) {
      val R = graft.ml.Reduce.LloydRounds
      val vecs = graft.api.Analytics.spread(
          Tables.embeddings(s, dir)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
        .withColumn("xq", expr("transform(v, x -> CAST(round(x * 1000, 0) AS BIGINT))"))
        .localCheckpoint() // coarse train + residual train + query passes
      val (assign, icents) = graft.ml.Reduce.gridLloydMemo(s, dir, "raw",
        Seq(Ann.IvfCells))(vecs.select(col("vec_id"), col("v")))
      val cells = assign.select(col("vec_id"), col("k").as("cell"))
        .localCheckpoint()
      val ccq = icents.select(col("k").as("cell"), col("cq").as("ccq"))
      // residual sub-vectors on the integer grid: rxq = xq − ccq(cell)
      val rbase = vecs.select(col("vec_id"), col("xq"))
        .join(cells, "vec_id")
        .join(broadcast(ccq), Seq("cell"))
        .withColumn("rxq", expr("zip_with(xq, ccq, (a, b) -> a - b)"))
        .withColumn("sub", explode(array((0 until PqSubs).map(lit(_)): _*)))
        .select(col("vec_id"), col("cell"), col("sub"),
          expr(s"slice(rxq, sub * $PqSubDim + 1, $PqSubDim)").as("rq"))
        .localCheckpoint() // every residual-Lloyd round + encode scans it
      // residual grid-Lloyd: vec_id mod 16 init, integer centroids.
      // r15 optimization (the gridLloyd/pqState rewrite, guide §2.3/
      // §2.4): the code column rides the residual frame — each round's
      // exchanges carry only centroid partials (the per-dim sums
      // map-side-combine into ≤ m·PqK·subdim groups) and the argmin is
      // a per-row fold over the broadcast codebook array. Bit-identical
      // per-dim round(sq/n) centroids and (d2, k) argmin order, so
      // codes and oracle hashes are unchanged.
      var g = rbase.select(col("vec_id"), col("sub"), col("rq"),
        pmod(col("vec_id"), lit(PqK.toLong)).as("k"))
      var rcents: DataFrame = null
      for (i <- 1 to R) {
        // one checkpoint before the FINAL round (the gridLloyd note)
        if (i == R) g = g.localCheckpoint()
        rcents = g
          .select(col("sub"), col("k"), posexplode(col("rq")).as(Seq("dim", "q")))
          .groupBy(col("sub"), col("k"), col("dim"))
          .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
          .withColumn("c", round(col("sq") / col("n").cast("double"), 0).cast("long"))
          .groupBy(col("sub"), col("k"))
          .agg(expr("transform(sort_array(collect_list(struct(dim, c))), s -> s.c)").as("rcq"))
        val carr = rcents.groupBy(col("sub"))
          .agg(collect_list(struct(col("k"), col("rcq"))).as("cents"))
        g = rbase.join(broadcast(carr), Seq("sub"))
          .withColumn("m", expr(
            """array_min(transform(cents, ce -> named_struct(
              |  'd2', aggregate(zip_with(rq, ce.rcq, (a, b) -> (a - b) * (a - b)),
              |          0L, (s, e) -> s + e),
              |  'k', ce.k)))""".stripMargin))
          .select(col("vec_id"), col("sub"), col("rq"), col("m.k").as("k"))
      }
      (vecs, cells, icents,
        g.select(col("vec_id"), col("sub"), col("k")).localCheckpoint(),
        rcents.localCheckpoint())
    }

  def annIvfPqResidualTopk(s: SparkSession, dir: String): DataFrame = {
    val (vecs, cells, icents, g, rcents) = residualState(s, dir)
    val ccq = icents.select(col("k").as("cell"), col("cq").as("ccq"))
    // query side: probe 4 cells on the raw grid, then per probed cell
    // build the residual ADC table against that cell's centroid
    val qs = vecs.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("qid"), col("xq").as("qxq"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probed = qs.crossJoin(broadcast(icents.select(col("k").as("cell"), col("cq"))))
      .withColumn("d2",
        expr("aggregate(zip_with(qxq, cq, (a, b) -> (a - b) * (a - b)), 0L, (s, e) -> s + e)"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= 4)
      .select(col("qid"), col("cell"))
    val dtab = qs.join(broadcast(probed), "qid")
      .join(broadcast(ccq), Seq("cell"))
      .withColumn("rq_full", expr("zip_with(qxq, ccq, (a, b) -> a - b)"))
      .withColumn("sub", explode(array((0 until PqSubs).map(lit(_)): _*)))
      .select(col("qid"), col("cell"), col("sub"),
        expr(s"slice(rq_full, sub * $PqSubDim + 1, $PqSubDim)").as("qrq"))
      .join(broadcast(rcents), Seq("sub"))
      .select(col("qid"), col("cell"), col("sub"), col("k"),
        expr("aggregate(zip_with(qrq, rcq, (a, b) -> (a - b) * (a - b)), 0L, (s, e) -> s + e)")
          .as("d2"))
    val cand = cells.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("cell"), col("vec_id"))
    val scored = cand
      .join(g, "vec_id")
      .join(broadcast(dtab), Seq("qid", "cell", "sub", "k"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc"))
    scored.groupBy(col("qid"))
      .agg(graft.functions.VectorFunctions
        .topKByScore(-col("adc").cast("double"), col("vec_id"), 10).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("neighbor_id"),
        (-col("e.score")).cast("long").as("adc_d2"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** PQ train/encode/ADC oracle: the lloydPrefixSql shape keyed by
    * (sub) instead of (kval). */
  /** PQ CTE chain (pqv … pg$R, pcentq$R, pdt) — shared by #230 and
    * the IVFPQ oracle #258. */
  private val pqCtesSql = {
    val R = graft.ml.Reduce.LloydRounds
    val round = (i: Int) =>
      s"""pcent$i AS (
         |  SELECT v.sub, g.k, v.dim,
         |         sum(CAST(round(v.x * 1e6, 0) AS BIGINT)) AS sq, count(*) AS n
         |  FROM pqv v JOIN pg${i - 1} g ON v.vec_id = g.vec_id AND v.sub = g.sub
         |  GROUP BY 1, 2, 3),
         |pcentq$i AS (
         |  SELECT sub, k, dim,
         |         CAST(round((sq / (1e6 * n)) * 1000, 0) AS BIGINT) AS cq
         |  FROM pcent$i),
         |pd$i AS (
         |  SELECT q.vec_id, q.sub, c.k,
         |         sum((q.xq - c.cq) * (q.xq - c.cq)) AS d2
         |  FROM pqxq q JOIN pcentq$i c ON q.sub = c.sub AND q.dim = c.dim
         |  GROUP BY 1, 2, 3),
         |pg$i AS MATERIALIZED (
         |  SELECT vec_id, sub, k FROM (
         |    SELECT vec_id, sub, k,
         |           row_number() OVER (PARTITION BY vec_id, sub
         |             ORDER BY d2 ASC, k ASC) AS rk
         |    FROM pd$i) WHERE rk = 1)""".stripMargin
    s"""pqv AS MATERIALIZED (
       |  SELECT vec_id, t.i // $PqSubDim AS sub, t.i % $PqSubDim AS dim, t.x
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e,
       |  LATERAL (SELECT unnest(v) AS x, generate_subscripts(v, 1) - 1 AS i) t),
       |pqxq AS MATERIALIZED (
       |  SELECT vec_id, sub, dim, CAST(round(x * 1000, 0) AS BIGINT) AS xq
       |  FROM pqv),
       |pg0 AS (SELECT DISTINCT vec_id, sub, vec_id % $PqK AS k FROM pqv),
       |${(1 to R).map(round).mkString(",\n")},
       |pdt AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, q.sub, c.k,
       |         sum((q.xq - c.cq) * (q.xq - c.cq)) AS d2
       |  FROM pqxq q JOIN pcentq$R c ON q.sub = c.sub AND q.dim = c.dim
       |  WHERE q.vec_id % 50 = 0 GROUP BY 1, 2, 3)""".stripMargin
  }

  private val annPqTopkSql = {
    val R = graft.ml.Reduce.LloydRounds
    s"""WITH $pqCtesSql,
       |padc AS (
       |  SELECT t.qid, g.vec_id AS nid, CAST(sum(t.d2) AS BIGINT) AS adc
       |  FROM pg$R g JOIN pdt t ON g.sub = t.sub AND g.k = t.k
       |  WHERE g.vec_id != t.qid GROUP BY 1, 2)
       |SELECT qid, nid AS neighbor_id, adc AS adc_d2, rk FROM (
       |  SELECT qid, nid, adc,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY adc ASC, nid ASC) AS rk
       |  FROM padc) WHERE rk <= 10""".stripMargin
  }

  /** IVFPQ oracle: the IVF probe over the grid-Lloyd cells prunes the
    * candidate set, the PQ code join scores it — both chains shared. */
  private val annIvfPqTopkSql = {
    val R = graft.ml.Reduce.LloydRounds
    s"""WITH $pqCtesSql,
       |${graft.ml.Reduce.lloydPrefixSql(Seq(Ann.IvfCells))},
       |ipd AS (
       |  SELECT q.vec_id AS qid, c.k AS cell,
       |         sum((q.xq - c.cq) * (q.xq - c.cq)) AS d2
       |  FROM lxq q JOIN lcentq$R c ON q.dim = c.dim
       |  WHERE q.vec_id % 50 = 0 GROUP BY 1, 2),
       |ipp AS (
       |  SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY d2 ASC, cell ASC) AS rk
       |    FROM ipd) WHERE rk <= 4),
       |icand AS (
       |  SELECT p.qid, g.vec_id AS nid
       |  FROM ipp p JOIN lg$R g ON g.k = p.cell
       |  WHERE g.vec_id != p.qid),
       |iadc AS (
       |  SELECT c.qid, c.nid, CAST(sum(t.d2) AS BIGINT) AS adc
       |  FROM icand c JOIN pg$R g ON c.nid = g.vec_id
       |  JOIN pdt t ON t.qid = c.qid AND t.sub = g.sub AND t.k = g.k
       |  GROUP BY 1, 2)
       |SELECT qid, nid AS neighbor_id, adc AS adc_d2, rk FROM (
       |  SELECT qid, nid, adc,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY adc ASC, nid ASC) AS rk
       |  FROM iadc) WHERE rk <= 10""".stripMargin
  }

  /** Residual-IVFPQ oracle (#276): shares lloydPrefixSql's coarse
    * cells, then replays the residual grid-Lloyd + per-(query, cell)
    * residual ADC — all-BIGINT, (d2, k)/(adc, nid) total orders. */
  private val annIvfPqResidualTopkSql = {
    val R = graft.ml.Reduce.LloydRounds
    val round = (i: Int) =>
      s"""rcent$i AS (
         |  SELECT v.sub, g.k, v.rdim,
         |         CAST(round(sum(v.rq) / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS cq
         |  FROM rqv v JOIN rg${i - 1} g ON v.vec_id = g.vec_id AND v.sub = g.sub
         |  GROUP BY 1, 2, 3),
         |rd$i AS (
         |  SELECT q.vec_id, q.sub, c.k,
         |         sum((q.rq - c.cq) * (q.rq - c.cq)) AS d2
         |  FROM rqv q JOIN rcent$i c ON q.sub = c.sub AND q.rdim = c.rdim
         |  GROUP BY 1, 2, 3),
         |rg$i AS MATERIALIZED (
         |  SELECT vec_id, sub, k FROM (
         |    SELECT vec_id, sub, k,
         |           row_number() OVER (PARTITION BY vec_id, sub
         |             ORDER BY d2 ASC, k ASC) AS rk
         |    FROM rd$i) WHERE rk = 1)""".stripMargin
    s"""WITH ${graft.ml.Reduce.lloydPrefixSql(Seq(Ann.IvfCells))},
       |rcells AS MATERIALIZED (SELECT vec_id, k AS cell FROM lg$R),
       |rqv AS MATERIALIZED (
       |  SELECT q.vec_id, q.dim // $PqSubDim AS sub, q.dim % $PqSubDim AS rdim,
       |         q.xq - c.cq AS rq
       |  FROM lxq q JOIN rcells g ON q.vec_id = g.vec_id
       |  JOIN lcentq$R c ON c.k = g.cell AND c.dim = q.dim),
       |rg0 AS (SELECT DISTINCT vec_id, sub, vec_id % $PqK AS k FROM rqv),
       |${(1 to R).map(round).mkString(",\n")},
       |ripd AS (
       |  SELECT q.vec_id AS qid, c.k AS cell,
       |         sum((q.xq - c.cq) * (q.xq - c.cq)) AS d2
       |  FROM lxq q JOIN lcentq$R c ON q.dim = c.dim
       |  WHERE q.vec_id % 50 = 0 GROUP BY 1, 2),
       |ripp AS MATERIALIZED (
       |  SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY d2 ASC, cell ASC) AS rk
       |    FROM ripd) WHERE rk <= 4),
       |rqres AS (
       |  SELECT p.qid, p.cell, q.dim // $PqSubDim AS sub,
       |         q.dim % $PqSubDim AS rdim, q.xq - c.cq AS rq
       |  FROM ripp p JOIN lxq q ON q.vec_id = p.qid
       |  JOIN lcentq$R c ON c.k = p.cell AND c.dim = q.dim),
       |rdt AS MATERIALIZED (
       |  SELECT q.qid, q.cell, q.sub, c.k,
       |         sum((q.rq - c.cq) * (q.rq - c.cq)) AS d2
       |  FROM rqres q JOIN rcent$R c ON q.sub = c.sub AND q.rdim = c.rdim
       |  GROUP BY 1, 2, 3, 4),
       |ricand AS (
       |  SELECT p.qid, p.cell, v.vec_id AS nid
       |  FROM ripp p JOIN rcells v ON v.cell = p.cell
       |  WHERE v.vec_id != p.qid),
       |riadc AS (
       |  SELECT c.qid, c.nid, CAST(sum(t.d2) AS BIGINT) AS adc
       |  FROM ricand c JOIN rg$R g ON c.nid = g.vec_id
       |  JOIN rdt t ON t.qid = c.qid AND t.cell = c.cell
       |             AND t.sub = g.sub AND t.k = g.k
       |  GROUP BY 1, 2)
       |SELECT qid, nid AS neighbor_id, adc AS adc_d2, rk FROM (
       |  SELECT qid, nid, adc,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY adc ASC, nid ASC) AS rk
       |  FROM riadc) WHERE rk <= 10""".stripMargin
  }

  // ---------------------------------------------------------------
  // 196-197. 1-bit binary quantization (sign-bit codes): the extreme
  // memory tier (32× smaller than float32 — 100 TB of embeddings serve
  // from ~3 TB) behind two-stage retrieval: a popcount hamming scan
  // produces a shortlist, exact cosine re-ranks it. Codes pack into two
  // 32-bit words per ≤64-dim vector; hamming = bit_count(w0⊕w0') +
  // bit_count(w1⊕w1') — all-integer, so both queries are hash-checked
  // oracles (rank ties in the small 0..64 hamming range are totally
  // ordered by (ham, vec_id)).

  /** Sign-bit signature words over the double vector `v` (dims ≤ 64:
    * bits 0-31 → w0, 32-63 → w1). Disjoint power-of-two terms make the
    * sum an OR — and every term < 2^32, so no overflow in either
    * engine. */
  private def withBinarySig(df: DataFrame): DataFrame =
    df.withColumn("w0", expr(
        """aggregate(sequence(0, least(size(v), 32) - 1), 0L,
          |  (acc, i) -> acc + IF(v[i] > 0D, shiftleft(1L, i), 0L))""".stripMargin))
      .withColumn("w1", expr(
        """IF(size(v) > 32,
          |  aggregate(sequence(32, size(v) - 1), 0L,
          |    (acc, i) -> acc + IF(v[i] > 0D, shiftleft(1L, i - 32), 0L)),
          |  0L)""".stripMargin))

  private def binaryScored(s: SparkSession, dir: String): DataFrame = {
    val sig = withBinarySig(graft.api.Analytics.spread(
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))))
    val qs = sig.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("w0").as("qw0"), col("w1").as("qw1"))
    sig.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .withColumn("ham",
        bit_count(col("qw0").bitwiseXOR(col("w0")))
          + bit_count(col("qw1").bitwiseXOR(col("w1"))))
  }

  /** Shortlist of `k` smallest-hamming candidates per query via the
    * bounded-heap aggregate (score = −ham: desc-score heap ⇒ asc
    * hamming, ties by smaller vec_id — the oracle's total order). */
  private def hammingTopk(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(graft.functions.VectorFunctions
        .topKByScore(-col("ham").cast("double"), col("vec_id"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("neighbor_id"),
        (-col("e.score")).cast("long").as("hamming"),
        (col("pos") + 1).cast("long").as("rk"))

  // 196. binary hamming top-k — the shortlist stage alone, exact-int.
  def annBinaryTopk(s: SparkSession, dir: String): DataFrame =
    hammingTopk(binaryScored(s, dir), 10)

  // 197. binary shortlist (top-50 hamming) re-ranked by exact cosine —
  // the production two-stage shape. The cosine pass touches only
  // |queries|·50 float vectors.
  def annBinaryRerankTopk(s: SparkSession, dir: String): DataFrame = {
    val shortlist = hammingTopk(binaryScored(s, dir), 50)
      .select(col("qid"), col("neighbor_id").as("vec_id"))
    val vecs = graft.api.Analytics.spread(
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val qv = vecs.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = shortlist.join(vecs, "vec_id").join(broadcast(qv), "qid")
      .withColumn("cs", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    scored.groupBy(col("qid"))
      .agg(graft.functions.VectorFunctions.topKByScore(col("cs"), col("vec_id"), 10).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), col("e.id").as("neighbor_id"),
        round(col("e.score"), 6).as("cos_sim"), (col("pos") + 1).cast("long").as("rk"))
  }

  // ---------------------------------------------------------------
  // 199. reciprocal-rank fusion (Cormack et al. 2009, k=60) of two
  // heterogeneous retrieval tiers: the LSH cosine ranking (#38) and the
  // binary hamming ranking (#196) — the standard hybrid-search combiner
  // (vector + keyword in production; here two index families over the
  // same corpus). rrf = Σ 1/(60+rank): a fixed two-term sum of exact
  // divisions, bit-identical cross-engine; (rrf desc, neighbor asc) is
  // a total order, so the fused list is hash-checked.
  def annRrfFusionTopk(s: SparkSession, dir: String): DataFrame = {
    val lsh = Ann.annLshTopk(s, dir)
      .select(col("qid"), col("neighbor_id"), col("rk").as("rk_lsh"))
    val bin = annBinaryTopk(s, dir)
      .select(col("qid"), col("neighbor_id"), col("rk").as("rk_bin"))
    val fused = lsh.join(bin, Seq("qid", "neighbor_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("rk_lsh")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60.0) + col("rk_bin")), lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rrf").desc, col("neighbor_id").asc)
    fused.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("neighbor_id"),
        round(col("rrf"), 6).as("rrf_score"), col("rk"))
  }

  // ---------------------------------------------------------------
  // 213. matryoshka truncation eval (Kusupati et al. 2022 MRL): per
  // query, recall@10 of exact cosine search over the FIRST 16 dims
  // against the full-dim exact top-10 — the go/no-go table for
  // MRL-style tiered serving (16/64 dims = another 4× memory tier,
  // orthogonal to SQ8/binary: truncate-then-quantize compounds).
  // Compares ID SETS only (both rank cuts are pinned by their own
  // hash-checked shapes), the annRecallEval convention. Brute-force
  // scorer on both sides = documented oracle path.
  def annMatryoshkaEval(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val emb16 = emb.select(col("vec_id"), expr("slice(embedding, 1, 16)").as("e16"))
    val truth = Ann.annBruteforceTopk(s, dir).select(col("qid"), col("neighbor_id"))
    val approx = graft.api.Similarity.bruteForceTopK(
        emb16, col("vec_id"), col("e16"),
        emb16.filter(pmod(col("vec_id"), lit(50)) === 0), col("vec_id"), col("e16"),
        k = 10)
      .select(col("qid"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("qid", "neighbor_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    truth.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_true"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_true"), 6).as("recall"))
  }

  private val annMatryoshkaEvalSql =
    """WITH full10 AS (
      |  SELECT qid, nid FROM (
      |    SELECT q.vec_id AS qid, c.vec_id AS nid,
      |           row_number() OVER (PARTITION BY q.vec_id
      |             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |                      c.vec_id ASC) AS rk
      |    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      |    WHERE q.vec_id % 50 = 0)
      |  WHERE rk <= 10),
      |t16 AS MATERIALIZED (
      |  SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v FROM embeddings),
      |trunc10 AS (
      |  SELECT qid, nid FROM (
      |    SELECT q.vec_id AS qid, c.vec_id AS nid,
      |           row_number() OVER (PARTITION BY q.vec_id
      |             ORDER BY list_cosine_similarity(q.v, c.v) DESC,
      |                      c.vec_id ASC) AS rk
      |    FROM t16 q JOIN t16 c ON q.vec_id != c.vec_id
      |    WHERE q.vec_id % 50 = 0)
      |  WHERE rk <= 10),
      |hits AS (
      |  SELECT f.qid, count(*) AS n_hit
      |  FROM full10 f JOIN trunc10 t ON f.qid = t.qid AND f.nid = t.nid
      |  GROUP BY 1)
      |SELECT f.qid, count(*) AS n_true,
      |       coalesce(any_value(h.n_hit), 0)::BIGINT AS n_hit,
      |       round(coalesce(any_value(h.n_hit), 0) / count(*), 6) AS recall
      |FROM full10 f LEFT JOIN hits h ON f.qid = h.qid
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // 314. Johnson-Lindenstrauss random-projection recall eval — the
  // dimension-reduction tier BESIDE the matryoshka prefix (#213 keeps
  // trained prefix dims; JL needs NO training at all: a fixed
  // pseudo-random ±-ish matrix preserves pairwise geometry to
  // O(√(ln n / d)) distortion, the other classic answer to "my
  // embeddings are too wide to scan"). Projection = the native
  // RandomProjection expression — the SAME SplitMix64 plane stream the
  // LSH bucket signs (one shared matrix across the whole engine, and
  // the oracle replays it through the established splitmixCtes HUGEINT
  // chain). Eval shape = #213's: exact cosine top-10 on the 16-dim
  // projections vs full-precision truth, ID-set recall@10 per query.
  // Scale: projection is one narrow codegen'd map (64→16 doubles);
  // the scorer inherits bruteForceTopK's broadcast-queries shape.
  def annJlProjEval(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val embJl = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.randomProjection(
        col("embedding").cast("array<double>"), 16).as("ejl"))
    val truth = Ann.annBruteforceTopk(s, dir).select(col("qid"), col("neighbor_id"))
    val approx = graft.api.Similarity.bruteForceTopK(
        embJl, col("vec_id"), col("ejl"),
        embJl.filter(pmod(col("vec_id"), lit(50)) === 0), col("vec_id"), col("ejl"),
        k = 10)
      .select(col("qid"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("qid", "neighbor_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    truth.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_true"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_true"), 6).as("recall"))
  }

  private val annJlProjEvalSql =
    s"""WITH full10 AS (
      |  SELECT qid, nid FROM (
      |    SELECT q.vec_id AS qid, c.vec_id AS nid,
      |           row_number() OVER (PARTITION BY q.vec_id
      |             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
      |                      c.vec_id ASC) AS rk
      |    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      |    WHERE q.vec_id % 50 = 0)
      |  WHERE rk <= 10),
      |dimn AS MATERIALIZED (
      |  SELECT max(len(embedding::DOUBLE[])) AS nd FROM embeddings),
      |pidx AS MATERIALIZED (
      |  SELECT t.j, u.i, (CASE WHEN u.i < 64 THEN t.j*64 + u.i
      |                  ELSE 9223372036854775808::HUGEINT + t.j*4032 + (u.i - 64) END)::HUGEINT AS x
      |  FROM (SELECT unnest(generate_series(0, 15)) AS j) t,
      |       dimn, LATERAL (SELECT unnest(generate_series(0, nd - 1)) AS i) u),
      |${Ann.splitmixCtes("p", "pidx", "j, i")},
      |planes AS MATERIALIZED (
      |  SELECT j, i,
      |         (((hs % 2000003) + 2000003) % 2000003) / 1000001.0 - 1.0 AS comp
      |  FROM ph),
      |vx AS MATERIALIZED (
      |  SELECT vec_id, t.i, t.x
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e,
      |  LATERAL (SELECT unnest(v) AS x, generate_subscripts(v, 1) - 1 AS i) t),
      |proj AS MATERIALIZED (
      |  SELECT vec_id, list(p ORDER BY j) AS v FROM (
      |    SELECT vx.vec_id, pl.j, sum(vx.x * pl.comp) AS p
      |    FROM vx JOIN planes pl ON vx.i = pl.i
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |jl10 AS (
      |  SELECT qid, nid FROM (
      |    SELECT q.vec_id AS qid, c.vec_id AS nid,
      |           row_number() OVER (PARTITION BY q.vec_id
      |             ORDER BY list_cosine_similarity(q.v, c.v) DESC,
      |                      c.vec_id ASC) AS rk
      |    FROM proj q JOIN proj c ON q.vec_id != c.vec_id
      |    WHERE q.vec_id % 50 = 0)
      |  WHERE rk <= 10),
      |hits AS (
      |  SELECT f.qid, count(*) AS n_hit
      |  FROM full10 f JOIN jl10 t ON f.qid = t.qid AND f.nid = t.nid
      |  GROUP BY 1)
      |SELECT f.qid, count(*) AS n_true,
      |       coalesce(any_value(h.n_hit), 0)::BIGINT AS n_hit,
      |       round(coalesce(any_value(h.n_hit), 0) / count(*), 6) AS recall
      |FROM full10 f LEFT JOIN hits h ON f.qid = h.qid
      |GROUP BY 1""".stripMargin

  /** Sign-bit signature + all-pairs hamming CTE prefix (1-based list
    * indexing; same disjoint-power sums as the Spark side). */
  private val binaryScoredSql =
    """bsig AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         CAST(list_sum(list_transform(generate_series(1, least(len(embedding), 32)),
      |           i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS w0,
      |         CASE WHEN len(embedding) > 32 THEN
      |           CAST(list_sum(list_transform(generate_series(33, len(embedding)),
      |             i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT)
      |         ELSE 0 END AS w1
      |  FROM embeddings),
      |hscore AS MATERIALIZED (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |         bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS ham,
      |         row_number() OVER (PARTITION BY q.vec_id
      |           ORDER BY bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) ASC,
      |                    c.vec_id ASC) AS srk
      |  FROM bsig q JOIN bsig c ON q.vec_id != c.vec_id
      |  WHERE q.vec_id % 50 = 0)""".stripMargin

  // ---------------------------------------------------------------
  // DuckDB oracles. The codebook + dequantize prefix is shared; list
  // indexing is 1-based in DuckDB vs the 0-based Spark subscripts, but
  // the per-element arithmetic is textually identical, so every vq
  // element matches Spark's to the last bit (same IEEE ops, same
  // order; round() is half-away-from-zero in both engines for the
  // non-negative code argument).
  private val dqPrefixSql =
    """mm AS (
      |  SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs
      |  FROM (SELECT d, min(x) AS mn, max(x) AS mx
      |        FROM (SELECT generate_subscripts(embedding, 1) AS d,
      |                     unnest(embedding::DOUBLE[]) AS x
      |              FROM embeddings)
      |        GROUP BY d)),
      |dq AS MATERIALIZED (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |         list_transform(generate_series(1, len(embedding)), i ->
      |           CASE WHEN maxs[i] = mins[i] THEN mins[i]
      |                ELSE mins[i] + round((embedding[i]::DOUBLE - mins[i]) / (maxs[i] - mins[i]) * 255.0)
      |                     * (maxs[i] - mins[i]) / 255.0 END) AS vq
      |  FROM embeddings, mm)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_quantize_audit" -> (embeddingQuantizeAudit _),
    "ann_sq_topk"              -> (annSqTopk _),
    "ann_pq_topk"              -> (annPqTopk _),
    "ann_ivfpq_topk"           -> (annIvfPqTopk _),
    "ann_ivfpq_residual_topk"  -> (annIvfPqResidualTopk _),
    "ann_ivf_sq_topk"          -> (annIvfSqTopk _),
    "ann_binary_topk"          -> (annBinaryTopk _),
    "ann_binary_rerank_topk"   -> (annBinaryRerankTopk _),
    "ann_rrf_fusion_topk"      -> (annRrfFusionTopk _),
    "ann_matryoshka_eval"      -> (annMatryoshkaEval _),
    "ann_jl_projection_eval"   -> (annJlProjEval _))

  val oracles: Map[String, String] = Map(
    "embedding_quantize_audit" ->
      s"""WITH $dqPrefixSql,
         |err AS (
         |  SELECT label,
         |         list_sum(list_transform(generate_series(1, len(v)),
         |           i -> (v[i] - vq[i]) * (v[i] - vq[i]))) / len(v) AS mse,
         |         list_max(list_transform(generate_series(1, len(v)),
         |           i -> abs(v[i] - vq[i]))) AS maxe,
         |         list_cosine_similarity(v, vq) AS cs
         |  FROM dq)
         |SELECT label, count(*) AS n_vecs,
         |       round(avg(mse) * 1e6, 6) AS avg_mse_e6,
         |       round(max(maxe), 9) AS max_abs_err,
         |       round(avg(cs), 6) AS avg_cos_sim
         |FROM err GROUP BY label""".stripMargin,
    "ann_sq_topk" ->
      s"""WITH $dqPrefixSql
         |SELECT qid, neighbor_id, cos_sim, rk FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         |         round(list_cosine_similarity(q.v, c.vq), 6) AS cos_sim,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY list_cosine_similarity(q.v, c.vq) DESC,
         |                    c.vec_id ASC) AS rk
         |  FROM dq q JOIN dq c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |WHERE rk <= 10""".stripMargin,
    "ann_ivf_sq_topk" ->
      s"""WITH $dqPrefixSql,
${graft.ml.Reduce.lloydPrefixSql(Seq(Ann.IvfCells), "SELECT vec_id, vq AS v FROM dq")},
${Ann.ivfTailSql}""",
    "ann_binary_topk" ->
      s"""WITH $binaryScoredSql
         |SELECT qid, nid AS neighbor_id, CAST(ham AS BIGINT) AS hamming,
         |       srk AS rk
         |FROM hscore WHERE srk <= 10""".stripMargin,
    "ann_binary_rerank_topk" ->
      s"""WITH $binaryScoredSql,
         |shortlist AS (SELECT qid, nid FROM hscore WHERE srk <= 50),
         |rer AS (
         |  SELECT s.qid, s.nid,
         |         list_cosine_similarity(q.v, c.v) AS cs,
         |         row_number() OVER (PARTITION BY s.qid
         |           ORDER BY list_cosine_similarity(q.v, c.v) DESC,
         |                    s.nid ASC) AS rk
         |  FROM shortlist s
         |  JOIN bsig q ON s.qid = q.vec_id
         |  JOIN bsig c ON s.nid = c.vec_id)
         |SELECT qid, nid AS neighbor_id, round(cs, 6) AS cos_sim, rk
         |FROM rer WHERE rk <= 10""".stripMargin,
    "ann_rrf_fusion_topk" ->
      s"""WITH ${Ann.lshSigPrefixSql},
         |${Ann.lshKnnSql(10, "WHERE s.vec_id % 50 = 0")},
         |$binaryScoredSql,
         |lshr AS (SELECT qid, nid, rk FROM scored WHERE rk <= 10),
         |binr AS (SELECT qid, nid, srk AS rk FROM hscore WHERE srk <= 10),
         |fused AS (
         |  SELECT coalesce(l.qid, b.qid) AS qid,
         |         coalesce(l.nid, b.nid) AS nid,
         |         coalesce(1.0 / (60.0 + l.rk), 0.0)
         |           + coalesce(1.0 / (60.0 + b.rk), 0.0) AS rrf
         |  FROM lshr l FULL OUTER JOIN binr b
         |    ON l.qid = b.qid AND l.nid = b.nid),
         |rnk AS (
         |  SELECT qid, nid, rrf, row_number() OVER (PARTITION BY qid
         |    ORDER BY rrf DESC, nid ASC) AS rk FROM fused)
         |SELECT qid, nid AS neighbor_id, round(rrf, 6) AS rrf_score,
         |       CAST(rk AS BIGINT) AS rk
         |FROM rnk WHERE rk <= 10""".stripMargin,
    "ann_matryoshka_eval" -> annMatryoshkaEvalSql,
    "ann_jl_projection_eval" -> annJlProjEvalSql,
    "ann_pq_topk" -> annPqTopkSql,
    "ann_ivfpq_topk" -> annIvfPqTopkSql,
    "ann_ivfpq_residual_topk" -> annIvfPqResidualTopkSql)
}
