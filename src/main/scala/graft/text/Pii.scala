package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines.
  *
  * Every pattern is written in the common subset of Java regex (Spark's
  * engine) and RE2 (DuckDB's engine) — character classes, bounded repeats
  * and `\b` word boundaries only; no backreferences or lookaround — so the
  * DuckDB oracle twin evaluates the identical automaton and the counts and
  * redacted text hash-match exactly.
  *
  * All operators are pure column expressions (whole-stage codegen, no UDF,
  * no shuffle): at 100 TB this runs at parquet-scan speed and the filter
  * composes with pushdown. No reference counterpart — LLM-pipeline
  * extension surface (the scrubbing step every corpus pipeline runs before
  * tokenization).
  */
object Pii {

  /** RFC-5322-lite email shape. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range check — scrubbing favors recall). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style phone NNN-NNN-NNNN. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))

  /** Redact all three PII classes with typed placeholders. Order matters
    * and is part of the contract: emails first (their domain part would
    * otherwise be visible to the IPv4 scan), then IPv4, then phones; the
    * placeholders contain no digits so later passes cannot re-match
    * earlier replacements. The DuckDB twin applies the same three
    * replacements in the same order. */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }
}
