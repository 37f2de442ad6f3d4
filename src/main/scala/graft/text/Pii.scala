package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction (driver mandate — no reference
  * analogue): the standard pretraining-pipeline scrub pass that masks
  * emails, IPv4 addresses, and international-format phone numbers
  * before training data leaves the pipeline.
  *
  * The patterns deliberately use only constructs with identical
  * semantics in Java regex (Spark) and RE2 (the DuckDB oracle): no
  * lookaround, no backreferences — plain character classes, bounded
  * repetition, and word boundaries. Scrub order is email → IPv4 →
  * phone; the phone pattern requires a leading `+`, so the passes
  * can't consume each other's matches.
  *
  * Scale shape: pure per-row codegen'd string expressions — no
  * shuffle, no UDF; a scan-project over any corpus width.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** International-ish: +CC-XXX-XXX[X]-XXX[X] with `-` or space groups. */
  val phoneRe = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{3,4}"

  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  private def count(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  def countEmails(text: Column): Column = count(text, emailRe)
  def countIps(text: Column): Column = count(text, ipv4Re)
  def countPhones(text: Column): Column = count(text, phoneRe)
}
