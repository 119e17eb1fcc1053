package graft

import org.apache.spark.sql.functions._

/** Semantics pins for graft.sc.SingleCell paths whose contract is not
  * fully captured by the DuckDB oracle alone. */
class SingleCellSpec extends SparkSpecBase {

  test("binned KS is a one-sided, bin-mass-bounded approximation of the exact KS") {
    // The scale path's contract (r7 verdict item 2): pre-binning can
    // only DROP candidate sup points, so D_binned ≤ D_exact per pair,
    // and the under-read is bounded by the largest probability mass a
    // single bin can hide — loose empirical ceiling 0.05 here (256
    // equal-width bins over the sf0.001 events.value distribution).
    val exact = graft.sc.SingleCell.queries("pairwise_ks")(spark, sf)
      .select(col("t1"), col("t2"), col("ks_d").as("d_exact"))
    val binned = graft.sc.SingleCell.queries("pairwise_ks_binned")(spark, sf)
      .select(col("t1"), col("t2"), col("ks_d").as("d_binned"))
    val joined = exact.join(binned, Seq("t1", "t2"), "full").collect()
    assert(joined.nonEmpty, "no KS pairs at all")
    joined.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3),
        s"pair sets differ between exact and binned: $r")
      val (de, db) = (r.getDouble(2), r.getDouble(3))
      assert(db <= de + 1e-9, s"binned D above exact D for $r")
      assert(de - db <= 0.05, s"binned D under-reads exact D by ${de - db} for $r")
    }
  }

  test("binned KS per-pair window partitions are bounded by the bin count") {
    // The point of the swap: the widest per-pair ECDF partition holds
    // ≤ 256 rows regardless of how continuous `value` is. Count rows
    // per (t1, t2) flowing into the window by replaying the pipeline's
    // pre-window shape: distinct (pair, bin) combinations.
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val perPairBins = ev
      .select(col("event_type"), col("value"))
      .crossJoin(broadcast(ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))))
      .withColumn("bin", least(floor((col("value") - col("mn")) * lit(256.0)
        / (col("mx") - col("mn"))), lit(255L)))
      .groupBy(col("event_type")).agg(countDistinct(col("bin")).as("nb"))
      .agg(max(col("nb"))).collect()(0).getLong(0)
    assert(perPairBins <= 256L,
      s"a group feeds more than 256 bins into the pair window: $perPairBins")
  }
}
