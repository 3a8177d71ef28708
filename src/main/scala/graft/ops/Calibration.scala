package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group adaptive quality calibration — instead of one corpus-wide
  * cutoff, each group (source, language, domain) gets the threshold that
  * trims its OWN bottom p-fraction of a score (length, token count, any
  * bounded integer quality signal). A fixed global floor either guts a
  * naturally-short source or lets a naturally-long one keep its junk;
  * per-group calibration is the standard fix (per-language length
  * thresholds, per-domain perplexity buckets).
  *
  * Exact WITHOUT a corpus-sized window: the per-group order statistic is
  * read off the (group, score) HISTOGRAM. One map-side-partial `groupBy`
  * collapses the corpus to histogram rows, then the cumulative sums run
  * over histogram rows only — a window partition holds a group's
  * DISTINCT SCORES, not its documents, so a hot source with 10^10 docs
  * but ~10^4 distinct lengths costs 10^4 window rows where a per-row
  * rank window would pin all 10^10 copies in one partition (the exact
  * skew trap the working notes ban). Everything after the first groupBy
  * is catalog-sized. Contrast with the KLL path (q09): that is the
  * right tool for unbounded/continuous scores, this one is EXACT when
  * the score domain is bounded.
  *
  * Threshold semantics: the smallest score whose cumulative count
  * reaches `ceil(p * n_group)`, with the product evaluated in IEEE
  * double arithmetic — deterministic and identical across engines
  * (multiplication is correctly rounded in both the JVM and DuckDB, the
  * q43/q44 cross-engine recipe), but for a p whose double
  * representation exceeds its rational value (e.g. 0.07 * 100 =
  * 7.000000000000001) the rank lands one above the rational ceil and
  * one extra score class trims. Callers needing the rational boundary
  * exactly should pick p values with exact binary representations
  * (multiples of 1/2^k). Kept = `score >= threshold`; ties at
  * the threshold are kept (trimming never splits a score class), so
  * the kept fraction can exceed 1 - p. `p = 0` keeps everything.
  * NULL scores and NULL groups are dropped: an unmeasurable document
  * cannot be calibrated and a group-less one has no budget to calibrate
  * against — callers route those through an explicit policy, not a
  * silent bucket.
  */
object Calibration {

  /** One row per group: (group, threshold, n_docs, n_kept), computed
    * entirely from the histogram — no second corpus pass.
    */
  def thresholdReport(df: DataFrame, groupCol: String, scoreCol: String,
                      p: Double): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"trim fraction p must be in [0,1]: $p")
    val hist = df
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(col(groupCol).as("group"), col(scoreCol).as("score"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("group"))
          .orderBy(col("score"))))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("group"))))
    // min(struct) picks the smallest qualifying score and carries that
    // row's cum/c along; kept = everything at or above the threshold
    cum.filter(col("cum") >= ceil(lit(p) * col("n")))
      .groupBy(col("group"))
      .agg(min(struct(col("score"), col("cum"), col("c"), col("n")))
        .as("__t"))
      .select(col("group"), col("__t.score").as("threshold"),
        col("__t.n").as("n_docs"),
        (col("__t.n") - col("__t.cum") + col("__t.c")).as("n_kept"))
  }

  /** The calibrated filter itself: rows at or above their group's
    * threshold (NULL-score / NULL-group rows drop, per the contract
    * above). The thresholds frame is catalog-sized — AQE broadcasts the
    * join — and the caller's columns pass through untouched.
    */
  def filterCalibrated(df: DataFrame, groupCol: String, scoreCol: String,
                       p: Double): DataFrame = {
    val thr = thresholdReport(df, groupCol, scoreCol, p)
      .select(col("group").as("__cal_group"),
        col("threshold").as("__cal_thr"))
    df.join(thr, col(groupCol) === col("__cal_group"))
      .filter(col(scoreCol) >= col("__cal_thr"))
      .drop("__cal_group", "__cal_thr")
  }
}
