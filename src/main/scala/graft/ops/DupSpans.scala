package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-span detection — the exact-substring family of corpus dedup
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better"), at word-window granularity: find every maximal run of
  * consecutive L-word windows whose content occurs more than once in the
  * corpus, and report it as a (doc, start, length) span. Downstream
  * pipelines cut or down-weight the spans instead of dropping whole
  * documents.
  *
  * Execution shape: one pass derives every document's rolling L-window
  * hashes WITH positions (posexplode over the single-walk ShingleHashes);
  * the only wide exchange repartitions the 16-byte (hash, id, pos) rows by
  * hash for the occurrence count — a window count, not a groupBy+self-join,
  * so the shingle derivation runs ONCE (CLAUDE.md round-1 lesson).
  * Consecutive flagged positions merge into maximal spans with the classic
  * gaps-and-islands trick (pos - row_number() is constant within a run) —
  * a per-document window, never a global sort. Text itself never crosses
  * the wire. 64-bit window-hash collisions can in principle glue two
  * different spans (~n²/2⁶⁴); exactness-critical uses re-verify span text.
  */
object DupSpans {

  /** (id, span_start, span_words) — maximal duplicated spans, where
    * span_start is the 0-based word offset and span_words the span length
    * in words (a run of k consecutive duplicated L-windows covers
    * k + L - 1 words, clamped to the document's word count). Windows
    * shorter than L words hash the whole text (ShingleHashes fallback), so
    * exact whole-doc duplicates shorter than L still surface — as spans of
    * the DOCUMENT's length, not the window's. `idCol` must be unique per
    * row: duplicate ids would interleave two texts' positions in one
    * islands partition and glue bogus spans.
    */
  def dupSpans(df: DataFrame, textCol: String, idCol: String,
               windowWords: Int = 8): DataFrame = {
    val windows = df.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).as("n_words"),
        posexplode(TextOps.shingles(col(textCol), windowWords))
          .as(Seq("pos", "h")))

    // windows occurring 2+ times anywhere (cross- OR within-doc repeats,
    // matching the substring-dedup definition): one pass, counted over a
    // by-hash window instead of a groupBy + join back (which would run
    // the shingle derivation once per side)
    val byHash = Window.partitionBy(col("h"))
    val flagged = windows
      .withColumn("n", count(lit(1)).over(byHash))
      .filter(col("n") > 1)
      .select(col("id"), col("n_words"), col("pos"))

    // gaps and islands: consecutive positions share (pos - row_number)
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    flagged
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        // clamp: the short-text fallback's single window stands for the
        // whole (shorter-than-L) document, not L words
        least(count(lit(1)) + lit(windowWords - 1),
          max(col("n_words"))).cast("long").as("span_words"))
      .select(col("id"), col("span_start"), col("span_words"))
  }

  /** Spans to CUT under keep-first semantics: like [[dupSpans]], but each
    * duplicated window's globally-first occurrence (minimum (id, pos)) is
    * exempt — cutting the returned spans removes repeated content while
    * one copy survives somewhere in the corpus, the Lee et al.
    * transformation. Overlap caveat inherent to window granularity: a
    * kept-first window may share words with a cut span of a DIFFERENT
    * duplicated window; spans are maximal over cut-flagged window starts.
    */
  def dupSpansKeepFirst(df: DataFrame, textCol: String, idCol: String,
                        windowWords: Int = 8): DataFrame = {
    val windows = df.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).as("n_words"),
        posexplode(TextOps.shingles(col(textCol), windowWords))
          .as(Seq("pos", "h")))
    val byHash = Window.partitionBy(col("h"))
    val byHashOrdered = byHash.orderBy(col("id"), col("pos"))
    val flagged = windows
      .withColumn("n", count(lit(1)).over(byHash))
      .withColumn("rank", row_number().over(byHashOrdered))
      .filter(col("n") > 1 && col("rank") > 1) // every copy but the first
      .select(col("id"), col("n_words"), col("pos"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    flagged
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        least(count(lit(1)) + lit(windowWords - 1),
          max(col("n_words"))).cast("long").as("span_words"))
      .select(col("id"), col("span_start"), col("span_words"))
  }

  /** Rewrite texts with the given spans removed: every word whose 0-based
    * position falls inside any of the document's (span_start, span_words)
    * ranges is dropped; documents without spans pass through untouched.
    * Composable with [[dupSpansKeepFirst]] for keep-first substring dedup.
    */
  def cutSpans(df: DataFrame, textCol: String, idCol: String,
               spans: DataFrame): DataFrame = {
    val byDoc = spans.groupBy(col("id"))
      .agg(collect_list(struct(col("span_start"), col("span_words")))
        .as("__spans"))
    df.join(byDoc, col(idCol) === byDoc("id"), "left").drop("id")
      .withColumn(s"${textCol}_cut",
        when(col("__spans").isNull, col(textCol)).otherwise(
          concat_ws(" ", filter(split(col(textCol), " "), (w, i) =>
            !exists(col("__spans"), s =>
              i.cast("long") >= s.getField("span_start") &&
                i.cast("long") < s.getField("span_start") + s.getField("span_words"))))))
      .drop("__spans")
  }
}
