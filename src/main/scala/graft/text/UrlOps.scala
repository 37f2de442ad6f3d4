package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL extraction + normalization for web-corpus curation (provenance
  * counting, per-domain mixing, link-spam scoring). All pure per-row
  * regex/array expressions inside codegen — no shuffle, no UDF.
  *
  * The pattern is written in the Java/RE2 common subset (character
  * classes and optional groups only — no backreferences, no lookaround)
  * so a DuckDB oracle running RE2 extracts byte-identical matches
  * (same doctrine as [[Pii]]). */
object UrlOps {

  /** `scheme://host[/path]` — host = dotted alnum/hyphen labels; path
    * chars cover the common unreserved + query set and stop at spaces
    * and closing punctuation. */
  val UrlPattern = "https?://[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+(/[A-Za-z0-9./_?=&-]*)?"

  /** All URL matches in document order. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** Registrable-ish domain of one URL: lowercased host with any
    * leading `www.` stripped (full suffix-list semantics need a lookup
    * table; this is the curation-grade normalization). */
  def domainOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "https?://([A-Za-z0-9.-]+)", 1)),
      "^www\\.", "")

  /** Normalized URL: lowercase scheme+host (path case preserved — path
    * is case-significant per RFC 3986), default-port-free, trailing
    * slash stripped. */
  def normalizeUrl(url: Column): Column = {
    val schemeHost = regexp_extract(url, "(https?://[A-Za-z0-9.-]+)", 1)
    val rest = regexp_replace(url, "^https?://[A-Za-z0-9.-]+", "")
    regexp_replace(concat(lower(schemeHost), rest), "/$", "")
  }
}
