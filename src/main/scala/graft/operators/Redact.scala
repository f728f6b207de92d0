package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern-driven text scrubbing — the PII-redaction / denylist-removal
  * step of a training-data pipeline (emails, IPs, phone numbers, known-bad
  * terms are replaced before a corpus is released for training).
  *
  * Scale shape: map-only — one codegen'd projection over the corpus, no
  * shuffle, no UDF. Each pattern costs one `regexp_count` (hit accounting
  * on the ORIGINAL text, so counts are independent of pattern order) and
  * one `regexp_replace` (applied sequentially, first pattern first).
  *
  * Pattern syntax is restricted to the intersection of Java regex (Spark)
  * and RE2 (DuckDB oracle): character classes, alternation, bounded
  * repetition, `\b` word boundaries — no lookaround, no backreferences.
  */
object Redact {

  /** One scrub rule: `name` labels the per-pattern hit-count column
    * (`n_<name>`), `regex` must be Java+RE2 compatible (see above). */
  final case class Pattern(name: String, regex: String, replacement: String)

  /** Default PII set: the scrub list a public-corpus release starts from.
    * Phone deliberately requires 8+ chars starting and ending in a digit
    * so plain small integers in prose never match. */
  val PiiPatterns: Seq[Pattern] = Seq(
    Pattern("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "[EMAIL]"),
    Pattern("ipv4",
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    Pattern("phone", "\\+?[0-9][0-9()\\- ]{6,14}[0-9]\\b", "[PHONE]"))

  /** Adds one `n_<name>` hit-count column per pattern (counted on the
    * original text) and a `redacted` column with every pattern replaced
    * in sequence. Input columns pass through unchanged. */
  def scrub(df: DataFrame, textCol: String,
            patterns: Seq[Pattern]): DataFrame = {
    val orig = col(textCol)
    val counted = patterns.foldLeft(df) { (acc, p) =>
      acc.withColumn(s"n_${p.name}",
        regexp_count(orig, lit(p.regex)))
    }
    val redacted: Column = patterns.foldLeft(orig) { (c, p) =>
      regexp_replace(c, p.regex, p.replacement)
    }
    counted.withColumn("redacted", redacted)
  }
}
