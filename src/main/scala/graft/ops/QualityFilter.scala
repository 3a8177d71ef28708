package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative document quality filtering — the Gopher-style rule gate a
  * training pipeline runs between ingestion and packing. Rules are (name,
  * predicate-of-violation) pairs evaluated in ONE projection over the
  * scan (plain codegen'd expressions, the [[graft.constraints.Validator]]
  * violations pattern applied to documents): the output carries every
  * document with its keep flag and the array of failed rule names, so the
  * same frame serves the keep-side (filter) and the audit side (groupBy
  * reasons) without a second pass.
  */
object QualityFilter {

  final case class Rules(
      minChars: Int = 50,
      maxChars: Int = 100000,
      minAlphaRatio: Double = 0.6,
      maxDigitRatio: Double = 0.2,
      /** max fraction of duplicate 3-word shingles (intra-doc repetition,
        * the Gopher dup-ngram rule): 1 - distinct/total over shingles.
        */
      maxRepetitionRatio: Double = 0.3,
      /** allowed language ids ([[TextOps.langId]]); empty = allow all */
      langAllow: Seq[String] = Nil)

  /** Fraction of repeated k-word shingles in one document:
    * 1 - distinct(shingles)/total(shingles); 0 for sub-k-word texts (the
    * single whole-text shingle cannot repeat).
    */
  def repetitionRatio(text: Column, k: Int = 3): Column = {
    val sh = TextOps.shingles(text, k)
    lit(1.0) - size(array_distinct(sh)) / size(sh).cast("double")
  }

  /** The rule set as (name, violated?) columns over a `text` column. */
  def ruleFlags(text: Column, rules: Rules): Seq[(String, Column)] = {
    val base = Seq(
      "too_short" -> (length(text) < rules.minChars),
      "too_long" -> (length(text) > rules.maxChars),
      "low_alpha" -> (TextOps.alphaRatio(text) < rules.minAlphaRatio),
      "digit_heavy" -> (TextOps.digitRatio(text) > rules.maxDigitRatio),
      "repetitive" -> (repetitionRatio(text) > rules.maxRepetitionRatio))
    if (rules.langAllow.isEmpty) base
    else base :+ ("lang" -> !TextOps.langId(text).isin(rules.langAllow: _*))
  }

  /** Annotate every document with (keep, reasons). A null text fails every
    * applicable rule check as "null_text" alone.
    */
  def annotate(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame = {
    val text = col(textCol)
    val flags = ruleFlags(text, rules)
    val reasons = when(text.isNull, array(lit("null_text")))
      .otherwise(array_compact(array(flags.map { case (name, bad) =>
        when(coalesce(bad, lit(true)), lit(name)).otherwise(lit(null))
      }: _*)))
    df.withColumn("reasons", reasons)
      .withColumn("keep", size(col("reasons")) === 0)
  }

  /** The kept corpus (the pipeline's pass-through side). */
  def filter(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame =
    annotate(df, textCol, rules).filter(col("keep"))
      .drop("keep", "reasons")
}
