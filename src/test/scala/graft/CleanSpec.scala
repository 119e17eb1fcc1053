package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the corpus-rewrite cleaning ops (#223-224). */
class CleanSpec extends SparkSpecBase {

  test("span removal bookkeeping is internally consistent and agrees with the dup audit") {
    val out = text.Clean.dedupSpanRemoval(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    out.values.foreach { r =>
      val (nw, nd, nr, kf) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nr >= 0 && nr <= nw, s"doc ${r.getLong(0)}: removed $nr of $nw")
      assert(kf >= 0.0 && kf <= 1.0)
      if (nd == 0) assert(nr == 0, s"doc ${r.getLong(0)}: no dup spans but $nr removed")
      // cleaned text's word count must equal n_words - n_removed
      val cleanedWords = r.getString(5).split(" ").count(_.nonEmpty)
      assert(cleanedWords == nw - nr,
        s"doc ${r.getLong(0)}: cleaned has $cleanedWords words, expected ${nw - nr}")
    }
    // a doc holds a dup span here iff the #174 audit counts a dup 8-gram for it
    val audit = text.TextOps.dupNgramFraction(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    audit.foreach { case (id, nDup) =>
      assert((nDup > 0) == (out(id).getLong(2) > 0),
        s"doc $id: audit n_dup=$nDup vs removal n_dup_spans=${out(id).getLong(2)}")
    }
  }

  test("code_detect scores are bounded and the prose corpus stays mostly prose") {
    val rows = text.Clean.codeDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getDouble(7)
      assert(score >= 0.0 && score <= 1.0)
      assert(r.getBoolean(8) == (score >= 0.5))
    }
    val codeFrac = rows.count(_.getBoolean(8)).toDouble / rows.length
    assert(codeFrac < 0.5, s"a prose corpus should not be majority-code ($codeFrac)")
  }
}
