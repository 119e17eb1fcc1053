package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the vocabulary/tokenizer-training analytics
  * (SURVEY.md §2 #220-222). */
class VocabSpec extends SparkSpecBase {
  import spark.implicits._

  test("bpe mergeOnce is greedy left-to-right non-overlapping") {
    // "aaaa" + (a,a): candidates at 0,1,2 — greedy merges 0 and 2
    // "aaa": candidates at 0,1 — greedy merges 0, leaves the tail "a"
    // "ba":  no candidate — untouched
    val dict = Seq(
      ("aaaa", 1L, Seq("a", "a", "a", "a")),
      ("aaa", 2L, Seq("a", "a", "a")),
      ("ba", 3L, Seq("b", "a"))
    ).toDF("w", "wc", "syms")
    val merged = text.Vocab.mergeOnce(dict, "a", "a")
      .select(col("w"), col("syms")).as[(String, Seq[String])].collect().toMap
    assert(merged("aaaa") == Seq("aa", "aa"))
    assert(merged("aaa") == Seq("aa", "a"))
    assert(merged("ba") == Seq("b", "a"))
  }

  test("bpe_merges emits 5 rounds whose argmax replays independently") {
    val out = text.Vocab.bpeMerges(spark, sf)
      .orderBy(col("merge_round"))
      .as[(Long, String, String, String, Long)].collect()
    assert(out.length == 5)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    out.foreach { case (_, l, r, m, c) => assert(m == l + r && c > 0) }
    // round 1's pair count recomputed independently over the word dict
    val (l1, r1, c1) = (out.head._2, out.head._3, out.head._5)
    val check = Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("wc"), explode(expr(
        """zip_with(slice(transform(sequence(1, length(w)), i -> substring(w, i, 1)), 1, greatest(length(w) - 1, 0)),
          |         slice(transform(sequence(1, length(w)), i -> substring(w, i, 1)), 2, greatest(length(w) - 1, 0)),
          |         (a, b) -> named_struct('l', a, 'r', b))""".stripMargin)).as("p"))
      .groupBy(col("p.l"), col("p.r")).agg(sum(col("wc")).as("c"))
      .orderBy(col("c").desc, col("l").asc, col("r").asc)
      .limit(1).as[(String, String, Long)].head()
    assert((check._1, check._2, check._3) == ((l1, r1, c1)))
  }

  test("deep bpe: 32 rounds extend the 5-round trajectory exactly") {
    val deep = text.Vocab.bpeTrainDeep(spark, sf).orderBy(col("merge_round"))
      .as[(Long, String, String, String, Long)].collect()
    assert(deep.length == 32)
    assert(deep.map(_._1).toSeq == (1L to 32L))
    deep.foreach { case (_, l, r, m, c) => assert(m == l + r && c > 0) }
    // greedy argmax is history-deterministic: the deep run's first five
    // merges ARE the 5-round trainer's output, not merely similar
    val five = text.Vocab.bpeMerges(spark, sf).orderBy(col("merge_round"))
      .as[(Long, String, String, String, Long)].collect()
    assert(deep.take(5).toSeq == five.toSeq)
  }

  test("deep bpe vocab inventory: symbols respell every word, counts reconcile") {
    val inv = text.Vocab.bpeVocabInventory(spark, sf).collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("sym_len"),
        r.getAs[Long]("n_words"), r.getAs[Long]("dict_positions"),
        r.getAs[Long]("token_count"), r.getAs[Long]("whole_word"))).toSeq
    assert(inv.nonEmpty)
    inv.foreach { case (sym, len, nw, pos, tc, ww) =>
      assert(len == sym.length.toLong)
      assert(nw >= 1 && pos >= nw && tc >= pos) // wc >= 1 per position
      assert(ww == 0L || ww == 1L)
      if (ww == 1L) assert(nw >= 1L && len >= 1L)
    }
    // merging never edits text: the final dict's symbols respell each word
    val dict = text.Vocab.deepBpeState(spark, sf)._2
    val spelled = dict
      .select(col("w"), concat_ws("", col("syms")).as("sp"))
      .as[(String, String)].collect()
    assert(spelled.nonEmpty)
    spelled.foreach { case (w, sp) => assert(w == sp) }
    // inventory token accounting equals the dict's weighted symbol count
    val total = dict.agg(sum(col("wc") * size(col("syms")).cast("long")))
      .as[Long].head()
    assert(inv.map(_._5).sum == total)
  }

  test("heaps_fit: sub-linear growth with the exact corpus vocab size") {
    val row = text.Vocab.heapsFit(spark, sf).collect()(0)
    val beta = row.getAs[Double]("heaps_beta")
    assert(beta > 0.0 && beta < 1.0) // Heap's law: vocabulary grows sub-linearly
    val vocab = Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
      .agg(countDistinct(col("w"))).as[Long].head()
    assert(row.getAs[Long]("vocab_size") == vocab)
  }

  test("charclass_profile fractions are complete and sum to 1") {
    val rows = text.Vocab.charclassProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fr = Seq("alpha_frac", "digit_frac", "space_frac", "punct_frac", "other_frac")
        .map(c => r.getAs[Double](c))
      assert(fr.forall(f => f >= 0.0 && f <= 1.0))
      assert(math.abs(fr.sum - 1.0) < 1e-4) // rounding at 6dp per class
    }
  }

  test("count-min sketch never underestimates and ranks by true count") {
    val rows = text.Vocab.cmsFrequency(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, tc, est, over, _) =>
      assert(est >= tc, s"CMS underestimated '$w': $est < $tc")
      assert(over == est - tc)
    }
    val byRank = rows.sortBy(_._5).map(_._2)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
      "rank order does not follow true counts")
  }

  test("stupid-backoff scores are finite log-probs and the held-out half scores lower") {
    val rows = text.Classify.trigramSbScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, sc) =>
      assert(n >= 1, s"doc $id has no trigrams")
      assert(!sc.isNaN && !sc.isInfinite, s"doc $id score $sc not finite")
      assert(sc <= 1e-9, s"doc $id log-score $sc > 0")
    }
    // the training half (even doc_ids) never backs off, the held-out
    // half pays the 0.4 penalty on unseen trigrams — means must order
    val (train, test) = rows.partition(_._1 % 2 == 0)
    val mt = train.map(_._3).sum / train.size
    val mh = test.map(_._3).sum / test.size
    assert(mt > mh, s"train mean $mt !> held-out mean $mh")
  }
}
