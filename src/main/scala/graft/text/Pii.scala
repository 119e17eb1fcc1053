package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for pre-training corpora — the standard
  * scrubbing pass before text ships to a training pipeline. Pure
  * per-row regex work: zero shuffles, whole-stage codegen, linear at
  * 100 TB. Patterns avoid lookaround/backrefs so they behave the same
  * under Java regex and RE2-family engines.
  *
  * The synthetic test corpus carries no PII, so this surface is
  * exercised by PiiSpec on crafted rows rather than a DuckDB oracle
  * query (an all-zero oracle would prove nothing).
  */
object Pii {

  /** (label, pattern, replacement) — order matters: longer/more
    * specific patterns run first so e.g. card numbers aren't partially
    * eaten by the phone pattern. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "\\b(?:\\d[ -]?){13,16}\\b", "<CARD>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    // leading \b can't sit before an optional '(' (boundary between two
    // non-word chars never matches) — anchor the area-code alternatives
    ("phone", "(?:\\+?\\d{1,2}[ .-]?)?(?:\\(\\d{3}\\)|\\b\\d{3})[ .-]?\\d{3}[ .-]?\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))

  /** Per-row PII hit counts, one column per pattern + a total. */
  def detect(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val counts = patterns.map { case (label, pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long").as(s"n_$label")
    }
    val total = patterns.map { case (label, _, _) => col(s"n_$label") }.reduce(_ + _)
    docs.select((id.as("doc_id") +: counts): _*)
      .withColumn("n_pii", total)
  }

  /** Text with every PII match replaced by its typed placeholder. */
  def redact(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val redacted = patterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }
    docs.select(id.as("doc_id"), text.as("text"), redacted.as("redacted"))
      .withColumn("was_redacted", col("text") =!= col("redacted"))
  }
}
