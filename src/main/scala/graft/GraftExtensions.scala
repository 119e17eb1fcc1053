package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * Catalyst expressions as SQL functions, so they're callable from
  * `spark.sql(...)` / `expr(...)` as well as the Column API.
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.register(ext)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(es: Seq[Expression]): Unit =
    require(es.length == n,
      s"$name expects $n argument(s), got ${es.length}")

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig", "minhash_sig(shingles) — 64-element minwise signature",
      (es: Seq[Expression]) => { arity("minhash_sig", 1)(es); MinHashSig(es.head, 64) }),
    ("simhash64", "simhash64(tokens) — 64-bit simhash",
      (es: Seq[Expression]) => { arity("simhash64", 1)(es); SimHash64(es.head) }),
    ("dot_product", "dot_product(a, b) — dot product of double arrays",
      (es: Seq[Expression]) => { arity("dot_product", 2)(es); DotProduct(es(0), es(1)) }),
    ("char_shingles", "char_shingles(text[, n]) — distinct char n-grams (default 5)",
      (es: Seq[Expression]) => es match {
        case Seq(t) => CharShingles(t, 5)
        case Seq(t, n) if n.foldable =>
          CharShingles(t, n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "char_shingles expects (text) or (text, <literal int n>)")
      }),
    ("jaccard_sim", "jaccard_sim(a, b) — set Jaccard of string arrays",
      (es: Seq[Expression]) => { arity("jaccard_sim", 2)(es); JaccardSim(es(0), es(1)) }),
    ("repetition_stats",
      "repetition_stats(words) — struct(n_words, n_distinct_words, n_2grams, n_distinct_2grams, top_2gram_count)",
      (es: Seq[Expression]) => { arity("repetition_stats", 1)(es); RepetitionStats(es.head) }),
    ("char_shingle_hashes",
      "char_shingle_hashes(text[, n]) — distinct xxhash64 of char n-grams (default 20)",
      (es: Seq[Expression]) => es match {
        case Seq(t) => CharShingleHashes(t, 20)
        case Seq(t, n) if n.foldable =>
          CharShingleHashes(t, n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "char_shingle_hashes expects (text) or (text, <literal int n>)")
      }),
    ("minhash_sig_text",
      "minhash_sig_text(text[, n[, hashes]]) — fused normalize+shingle(n, default 5)+minhash(default 64) signature",
      (es: Seq[Expression]) => es match {
        case Seq(t) => MinHashSigText(t, 5, 64)
        case Seq(t, n) if n.foldable =>
          MinHashSigText(t, n.eval().asInstanceOf[Number].intValue(), 64)
        case Seq(t, n, h) if n.foldable && h.foldable =>
          MinHashSigText(t, n.eval().asInstanceOf[Number].intValue(),
            h.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "minhash_sig_text expects (text[, <literal int n>[, <literal int hashes>]])")
      }),
    ("long_match_frac",
      "long_match_frac(a, b) — fraction of positions where two long arrays agree",
      (es: Seq[Expression]) => { arity("long_match_frac", 2)(es); LongMatchFrac(es(0), es(1)) }),
    ("hyperplane_bucket",
      "hyperplane_bucket(vec[, planes]) — random-hyperplane LSH sign bucket (default 16 planes)",
      (es: Seq[Expression]) => es match {
        case Seq(v) => HyperplaneBucket(v, 16)
        case Seq(v, p) if p.foldable =>
          HyperplaneBucket(v, p.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "hyperplane_bucket expects (vec) or (vec, <literal int planes>)")
      }),
    ("bounded_levenshtein",
      "bounded_levenshtein(a, b, max) — banded edit distance, max+1 when above the cap",
      (es: Seq[Expression]) => es match {
        case Seq(a, b, m) if m.foldable =>
          BoundedLevenshtein(a, b, m.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "bounded_levenshtein expects (a, b, <literal int max>)")
      }),
    ("topk_by",
      "topk_by(score, id, k) — aggregate: array of the k (id, score) structs with the highest scores",
      (es: Seq[Expression]) => es match {
        case Seq(s, i, k) if k.foldable =>
          TopKByScore(s, i, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "topk_by expects (score, id, <literal int k>)")
      }),
    ("approx_heavy_hitters",
      "approx_heavy_hitters(item, k) — aggregate: Misra-Gries frequent items, ≤ k counters, error ≤ N/(k+1)",
      (es: Seq[Expression]) => es match {
        case Seq(i, k) if k.foldable =>
          ApproxHeavyHitters(i, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "approx_heavy_hitters expects (item, <literal int k>)")
      }),
    ("deflate_ratio",
      "deflate_ratio(text[, level]) — deflate-compressed/raw byte ratio (default level 6)",
      (es: Seq[Expression]) => es match {
        case Seq(t) => DeflateRatio(t, 6)
        case Seq(t, l) if l.foldable =>
          DeflateRatio(t, l.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "deflate_ratio expects (text) or (text, <literal int level>)")
      }),
    ("splitmix_comp",
      "splitmix_comp(x) — SplitMix64 of a bigint folded to [-1000001, 1000001] (integer hyperplane component)",
      (es: Seq[Expression]) => { arity("splitmix_comp", 1)(es); SplitMixComp(es.head) }),
    ("char_ngram_counts",
      "char_ngram_counts(text[, n]) — map of char n-gram → count (default 2)",
      (es: Seq[Expression]) => es match {
        case Seq(t) => CharNgramCounts(t, 2)
        case Seq(t, n) if n.foldable =>
          CharNgramCounts(t, n.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "char_ngram_counts expects (text) or (text, <literal int n>)")
      }))

  def register(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }

  /** Register into an already-running session (builder extensions only
    * apply at session creation — this covers notebooks/REPLs). */
  def installInto(spark: org.apache.spark.sql.SparkSession): Unit =
    fns.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.GraftGlue.registerFunction(spark, name, info(name, usage), builder)
    }
}
