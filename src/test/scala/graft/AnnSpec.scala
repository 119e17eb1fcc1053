package graft

import org.apache.spark.sql.Row

/** ANN semantics: approximate paths must return valid, correctly-ranked
  * neighbors and achieve measurable recall against brute force. */
class AnnSpec extends SparkSpecBase {

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Double)]] =
    df.select("qid", "neighbor_id", "cos_sim", "rk").collect()
      .map { case Row(q: Long, n: Long, c: Double, _: Long) => (q, n, c) }
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(x => (x._2, x._3)).toSeq }

  lazy val brute: Map[Long, Seq[(Long, Double)]] = topkMap(sim.Ann.annBruteforceTopk(spark, sf))

  test("brute force returns exactly 10 ranked neighbors per query") {
    assert(brute.nonEmpty)
    brute.foreach { case (q, ns) =>
      assert(ns.size == 10, s"query $q has ${ns.size} neighbors")
      val sims = ns.map(_._2)
      assert(sims == sims.sortBy(-_), s"query $q not rank-ordered")
    }
  }

  test("LSH top-k is a valid subset ranking with nonzero recall") {
    val lsh = topkMap(sim.Ann.annLshTopk(spark, sf))
    assert(lsh.nonEmpty)
    val recalls = lsh.collect { case (q, ns) if brute.contains(q) =>
      ns.map(_._1).toSet.intersect(brute(q).map(_._1).toSet).size / 10.0
    }
    val recall = recalls.sum / recalls.size
    info(s"LSH recall@10 = $recall")
    // multi-probe scans ~6/32 buckets ≈ 19% of the corpus; random
    // sampling at that rate would give recall ≈ 0.19 — hyperplane
    // locality must clearly beat it (measured 0.42, deterministic)
    assert(recall > 0.3, s"LSH recall $recall no better than random sampling")
    // every reported similarity must not exceed the true best
    lsh.foreach { case (q, ns) =>
      assert(ns.head._2 <= brute(q).head._2 + 1e-9)
    }
  }

  test("IVF top-k probes nearest cells with better-than-random recall") {
    val ivf = topkMap(sim.Ann.annIvfTopk(spark, sf))
    assert(ivf.nonEmpty)
    val recalls = ivf.collect { case (q, ns) if brute.contains(q) =>
      ns.map(_._1).toSet.intersect(brute(q).map(_._1).toSet).size / 10.0
    }
    val recall = recalls.sum / recalls.size
    info(s"IVF recall@10 (nprobe=4/16) = $recall")
    // nprobe=4 of 16 cells scans ~1/4 of the corpus; random sampling
    // would give recall ≈ 0.25 — nearest-centroid probing must clearly
    // beat it (measured 0.61, deterministic: seeded KMeans).
    assert(recall > 0.4, s"IVF recall $recall no better than random sampling")
  }
}
