package graft

/** MLlib reductions: structural invariants (component variance ordering,
  * cluster arity, determinism under a fixed seed). */
class ReduceSpec extends SparkSpecBase {

  test("PCA components are variance-ordered") {
    val rows = ml.Reduce.pcaEmbeddings(spark, sf).select("pc1", "pc2").collect()
    assert(rows.length == 500)
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(rows.map(_.getDouble(0)).toSeq)
    val v2 = variance(rows.map(_.getDouble(1)).toSeq)
    assert(v1 >= v2, s"pc1 var $v1 < pc2 var $v2")
  }

  test("KMeans assigns every vector to one of k clusters, deterministically") {
    val a = ml.Reduce.kmeansClusters(spark, sf)
    val clusters = a.select("cluster").distinct().collect().map(_.getInt(0)).toSet
    assert(clusters.forall(c => c >= 0 && c < 10))
    assert(a.count() == 500)
    val b = ml.Reduce.kmeansClusters(spark, sf)
    assert(a.collect().map(r => (r.getLong(0), r.getInt(2))).toMap ==
      b.collect().map(r => (r.getLong(0), r.getInt(2))).toMap,
      "same seed must give the same assignment")
  }
}
