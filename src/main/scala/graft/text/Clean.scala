package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-rewrite cleaning ops (SURVEY.md §2.5 extension): the step
  * after the audit tables — actually producing the cleaned text.
  *
  * #223 dedup_span_removal is the ExactSubstr-style rewrite (Lee et
  * al. 2022 "Deduplicating Training Data Makes Language Models
  * Better"): #174 dup_ngram_fraction AUDITS cross-doc duplicated word
  * 8-grams; this op REMOVES every word covered by one and emits the
  * cleaned token stream. #224 code_detect is the code-vs-prose screen
  * (Dolma/RefinedWeb keep-or-route signal) from pure per-row regex
  * counts.
  */
object Clean {

  private def r(c: Column, d: Int): Column = round(c, d)

  // ---------------------------------------------------------------
  // 223. cross-doc duplicated-span removal. A word 8-gram is
  // "duplicated" when it occurs in ≥2 DISTINCT documents (within-doc
  // repetition is #61's business, not removal's); every occurrence of
  // a duplicated gram covers its 8 word positions, covered positions
  // union into spans, and the doc rebuilds from the surviving words.
  // Spans are removed from ALL docs holding them (the symmetric
  // variant; keep-first needs a global tie-break pass over the same
  // tables). Gram keys stay STRINGS here so the rewrite is exactly
  // replayable; at 100 TB you key the df table by xxhash64(gram) (the
  // #174 device) + a bloom-filter pre-screen on the join — identical
  // plan shape, one corpus-wide gram shuffle either way.
  private val SpanN = 8

  def dedupSpanRemoval(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir).select(col("doc_id"),
      expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ws"))
    // every gram START (1-based, within-doc duplicates kept — each
    // occurrence covers its own positions)
    val starts = toks.filter(size(col("ws")) >= SpanN)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ws) - ${SpanN - 1}), " +
          s"i -> named_struct('i', i, 'g', array_join(slice(ws, i, $SpanN), ' ')))")).as("e"))
      .select(col("doc_id"), col("e.i").as("i"), col("e.g").as("g"))
    // document frequency over distinct (doc, gram)
    val df = starts.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    val dupStarts = starts.hint("shuffle_hash")
      .join(df.filter(col("df") >= 2).hint("shuffle_hash"), "g")
      .select(col("doc_id"), col("i"))
    val covered = dupStarts
      .select(col("doc_id"), explode(expr(s"sequence(i, i + ${SpanN - 1})")).as("pos"))
      .distinct()
    val words = toks.select(col("doc_id"), posexplode(col("ws")).as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("w"))
    val kept = words.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(expr("array_join(transform(sort_array(collect_list(struct(pos, w))), x -> x.w), ' ')")
        .as("cleaned_text"),
        count(lit(1)).as("n_kept"))
    val nDup = dupStarts.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
    Tables.documents(s, dir).select(col("doc_id"), size(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).cast("long").as("n_words"))
      .join(kept, Seq("doc_id"), "left")
      .join(nDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        r(when(col("n_words") === 0, lit(1.0))
          .otherwise(coalesce(col("n_kept"), lit(0L)) / col("n_words").cast("double")), 6)
          .as("keep_frac"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  private val dedupSpanRemovalSql =
    s"""WITH toks AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
         FROM documents),
       starts AS (
         SELECT doc_id, CAST(u.i AS INT) AS i,
                array_to_string(ws[CAST(u.i AS INT):CAST(u.i + ${SpanN - 1} AS INT)], ' ') AS g
         FROM toks, LATERAL unnest(generate_series(1, len(ws) - ${SpanN - 1})) AS u(i)
         WHERE len(ws) >= $SpanN),
       freq AS (
         SELECT g, count(*) AS df
         FROM (SELECT DISTINCT doc_id, g FROM starts) GROUP BY 1),
       dup_starts AS (
         SELECT s.doc_id, s.i FROM starts s JOIN freq f USING (g) WHERE f.df >= 2),
       covered AS (
         SELECT DISTINCT doc_id, CAST(u.pos AS INT) AS pos
         FROM dup_starts, LATERAL unnest(generate_series(i, i + ${SpanN - 1})) AS u(pos)),
       words AS (
         SELECT doc_id, CAST(u.pos AS INT) AS pos, ws[CAST(u.pos AS INT)] AS w
         FROM toks, LATERAL unnest(generate_series(1, len(ws))) AS u(pos)),
       kept AS (
         SELECT w.doc_id,
                string_agg(w.w, ' ' ORDER BY w.pos) AS cleaned_text,
                count(*) AS n_kept
         FROM words w ANTI JOIN covered c ON w.doc_id = c.doc_id AND w.pos = c.pos
         GROUP BY 1),
       ndup AS (SELECT doc_id, count(*) AS n_dup_spans FROM dup_starts GROUP BY 1)
       SELECT d.doc_id,
              CAST(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS BIGINT) AS n_words,
              coalesce(n.n_dup_spans, 0) AS n_dup_spans,
              len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) - coalesce(k.n_kept, 0) AS n_removed,
              round(CASE WHEN len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) = 0 THEN 1.0
                    ELSE coalesce(k.n_kept, 0)
                         / CAST(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS DOUBLE) END, 6)
                AS keep_frac,
              coalesce(k.cleaned_text, '') AS cleaned_text
       FROM documents d
       LEFT JOIN kept k ON d.doc_id = k.doc_id
       LEFT JOIN ndup n ON d.doc_id = n.doc_id"""

  // ---------------------------------------------------------------
  // 224. code-vs-prose detection — the routing signal corpus curation
  // runs before language filters (code files masquerade as English and
  // poison prose perplexity stats; prose in code dumps wastes the code
  // budget). Pure per-row regex counts (shared Java-regex/RE2 syntax,
  // the text_quality contract), blended into a [0,1] score: brace /
  // semicolon density, indented-line starts, camelCase + snake_case
  // identifiers, and code keywords. Zero shuffles, linear at 100 TB.
  private val CodeKeywords =
    Seq("def", "class", "import", "return", "function", "var", "const", "if", "else", "for")

  def codeDetect(s: SparkSession, dir: String): DataFrame = {
    def cnt(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    val kwPat = s"\\b(${CodeKeywords.mkString("|")})\\b"
    val len = greatest(length(col("text")).cast("double"), lit(1.0))
    val nw = greatest(size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("double"), lit(1.0))
    Tables.documents(s, dir).select(col("doc_id"), col("source"),
        cnt("[{}()\\[\\];]").as("n_syntax"),
        cnt("\\n[ \\t]").as("n_indent"),
        cnt("[a-z][A-Z]").as("n_camel"),
        cnt("[a-z0-9]_[a-z0-9]").as("n_snake"),
        cnt(kwPat).as("n_keyword"),
        len.as("len"), nw.as("nw"))
      .select(col("doc_id"), col("source"),
        col("n_syntax"), col("n_indent"), col("n_camel"), col("n_snake"), col("n_keyword"),
        r(least(lit(1.0),
          lit(8.0) * col("n_syntax") / col("len")
            + lit(4.0) * col("n_indent") / greatest(col("n_syntax") + col("n_indent"), lit(1.0))
              * col("n_indent") / col("nw")
            + lit(2.0) * (col("n_camel") + col("n_snake")) / col("nw")
            + lit(1.0) * col("n_keyword") / col("nw")), 6).as("code_score"))
      .withColumn("is_code", col("code_score") >= 0.5)
  }

  private val codeDetectSql = {
    val kwPat = s"\\b(${CodeKeywords.mkString("|")})\\b"
    s"""SELECT doc_id, source,
              CAST(len(regexp_extract_all(text, '[{}()\\[\\];]')) AS BIGINT) AS n_syntax,
              CAST(len(regexp_extract_all(text, '\\n[ \\t]')) AS BIGINT) AS n_indent,
              CAST(len(regexp_extract_all(text, '[a-z][A-Z]')) AS BIGINT) AS n_camel,
              CAST(len(regexp_extract_all(text, '[a-z0-9]_[a-z0-9]')) AS BIGINT) AS n_snake,
              CAST(len(regexp_extract_all(text, '$kwPat')) AS BIGINT) AS n_keyword,
              round(least(1.0,
                8.0 * len(regexp_extract_all(text, '[{}()\\[\\];]'))
                    / greatest(CAST(length(text) AS DOUBLE), 1.0)
                  + 4.0 * len(regexp_extract_all(text, '\\n[ \\t]'))
                        / greatest(len(regexp_extract_all(text, '[{}()\\[\\];]'))
                                   + len(regexp_extract_all(text, '\\n[ \\t]')), 1.0)
                        * len(regexp_extract_all(text, '\\n[ \\t]'))
                        / greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0)
                  + 2.0 * (len(regexp_extract_all(text, '[a-z][A-Z]'))
                           + len(regexp_extract_all(text, '[a-z0-9]_[a-z0-9]')))
                        / greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0)
                  + 1.0 * len(regexp_extract_all(text, '$kwPat'))
                        / greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0)), 6)
                AS code_score,
              code_score >= 0.5 AS is_code
       FROM documents"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_span_removal" -> (dedupSpanRemoval _),
    "code_detect"        -> (codeDetect _))

  val oracles: Map[String, String] = Map(
    "dedup_span_removal" -> dedupSpanRemovalSql,
    "code_detect"        -> codeDetectSql)
}
