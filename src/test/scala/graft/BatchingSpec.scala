package graft

import org.apache.spark.sql.functions._

/** Dataloader-side batch construction (#211-212): shard balance and
  * position contiguity, and the greedy token-budget cut invariant. */
class BatchingSpec extends SparkSpecBase {

  test("shard assignment covers every doc with contiguous per-shard positions") {
    val rows = text.Batching.shardAssign(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_.getLong(0)).distinct.length.toLong == nDocs, "one row per doc")
    val byShard = rows.groupBy(_.getLong(1))
    byShard.foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 16)
      val pos = rs.map(_.getLong(2)).sorted
      assert(pos.toSeq == (0L until rs.length.toLong), s"shard $shard positions must be 0..n-1")
    }
    // hash sharding balances in expectation: no shard may hold more
    // than 4x its fair share on this corpus
    val fair = nDocs.toDouble / 16
    assert(byShard.values.map(_.length).max <= fair * 4,
      s"worst shard ${byShard.values.map(_.length).max} vs fair $fair")
  }

  test("length buckets respect the power-of-two bound and the greedy budget cut") {
    val batches = text.Batching.lengthBucketBatches(spark, sf).collect()
    assert(batches.nonEmpty)
    batches.foreach { b =>
      val bucket = b.getLong(0)
      val maxTok = b.getLong(4)
      if (bucket >= 0) {
        assert(maxTok >= (1L << bucket) && maxTok < (1L << (bucket + 1)),
          s"bucket $bucket holds a doc of $maxTok tokens")
      } else assert(maxTok == 0L, "bucket -1 is the empty-doc bucket")
      // greedy cut: every batch except possibly via one straddling doc
      // stays within the 2048-token budget
      val tokSum = b.getLong(3)
      assert(tokSum - maxTok < 2048,
        s"batch (${bucket}, ${b.getLong(1)}) start offsets must precede the budget edge")
      val waste = b.getDouble(5)
      assert(waste >= 0.0 && waste < 1.0)
    }
    // the whole corpus is batched exactly once
    val total = batches.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("chunking covers every token once per stride with 64-token overlaps") {
    val chunks = text.Batching.chunkDocuments(spark, sf).collect()
    val docs = chunks.groupBy(_.getLong(0))
    assert(docs.size.toLong == Tables.documents(spark, sf).count(), "every doc chunks")
    docs.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i, "chunk indices are dense")
        assert(c.getLong(2) == i * 448L, "starts advance by the 448 stride")
        assert(c.getLong(3) <= 512L, "chunk length capped at 512")
      }
      // chunks with >= 2 successors are always full (the tail two may be
      // truncated by the doc end); the final chunk reaches the doc end
      sorted.dropRight(2).foreach(c => assert(c.getLong(3) == 512L,
        s"doc $id: deep-interior chunks must be full"))
      val nTok = sorted.map(c => c.getLong(2) + c.getLong(3)).max
      assert(sorted.last.getLong(2) + sorted.last.getLong(3) == nTok,
        s"doc $id: the last chunk must reach the doc end")
    }
  }
}
