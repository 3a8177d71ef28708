package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction: regex scrubbing of the entity classes a training corpus
  * must not memorize, with per-class counts so the audit side reports what
  * was removed where. Pure codegen'd expressions (regexp_count /
  * regexp_replace) — one projection, no UDFs; patterns are applied in a
  * fixed order so overlapping matches resolve deterministically (emails
  * before phones: an email's digits must not half-match as a phone).
  */
object Redaction {

  /** (class name, pattern, replacement token), applied in order: the more
    * specific classes run first so the greedy phone pattern cannot eat an
    * email's digits, a dotted quad, or an SSN-shaped id.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("ssn_like", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"),
    ("phone", "\\+?\\d[\\d -]{7,14}\\d", "<PHONE>"))

  /** The scrubbed text: every class replaced by its token, in order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (_, re, token)) =>
      regexp_replace(t, re, token)
    }

  /** Per-class match counts BEFORE scrubbing later classes would alter
    * them: counts are evaluated against the text as the previous classes
    * left it, matching [[redact]]'s application order exactly.
    */
  def counts(text: Column): Seq[(String, Column)] = {
    var t = text
    patterns.map { case (name, re, token) =>
      val c = name -> regexp_count(t, lit(re))
      t = regexp_replace(t, re, token)
      c
    }
  }

  /** Annotate a frame with the scrubbed text and per-class counts. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = counts(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(s"n_$name", c.cast("long"))
    }
    withCounts.withColumn(s"${textCol}_redacted", redact(col(textCol)))
  }
}
