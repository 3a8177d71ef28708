package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.ops.{CosineSim, MinHash64, RhpSignature, ShingleHashes, SimHash64}
import graft.sequences.{TokenStats, ViolationMask}
import graft.stats.{KllSketchAgg, TokenHistAgg}

/** SQL registration of the engine's native expressions, so
  * `spark.sql("SELECT minhash64(shingle_hashes(text, 3), 32) ...")` works
  * alongside the Column API.
  *
  * Two entry points:
  *  - `spark-submit --conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard injection path for cluster deployments);
  *  - [[GraftFunctions.register]] for an already-built session (tests,
  *    notebooks).
  *
  * Static parameters (shingle width, permutation count, seeds, bounds)
  * are taken as foldable literals, matching how Spark's own parameterized
  * functions (e.g. approx_percentile) read plan-time constants.
  */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  /** (name, usage, builder) for every SQL-exposed function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("token_stats",
      "token_stats(tokens) - struct(n, n_null, min, max) in one walk",
      (args: Seq[Expression]) => TokenStats(args.head)),
    ("shingle_hashes",
      "shingle_hashes(text, k) - word k-shingle xxhash64 array",
      (args: Seq[Expression]) =>
        ShingleHashes(args(0), litInt(args(1), "k"))),
    ("minhash64",
      "minhash64(hashes, perms) - MinHash signature of a hash array",
      (args: Seq[Expression]) =>
        MinHash64(args(0), litInt(args(1), "perms"))),
    ("simhash64",
      "simhash64(hashes) - 64-bit SimHash of a hash array",
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("rhp_signature",
      "rhp_signature(vec, planes, seed) - cosine-LSH bucket signature",
      (args: Seq[Expression]) =>
        RhpSignature(args(0), litInt(args(1), "planes"), litLong(args(2), "seed"))),
    ("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float/double arrays",
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("violation_mask",
      "violation_mask(tokens, n_tok, vocab, min_ntok, max_ntok) - row-check bitmask",
      (args: Seq[Expression]) =>
        ViolationMask(args(0), args(1), litInt(args(2), "vocab"),
          litInt(args(3), "min_ntok"), litInt(args(4), "max_ntok"))),
    ("gen_tokens",
      "gen_tokens(id, n, seed, vocab) - deterministic synthetic token array",
      (args: Seq[Expression]) =>
        graft.sequences.GenTokens(args(0), args(1),
          litLong(args(2), "seed"), litInt(args(3), "vocab"))),
    ("kll_sketch_agg2",
      "kll_sketch_agg2(col, k) - KLL quantile sketch bytes (aggregate)",
      (args: Seq[Expression]) =>
        KllSketchAgg(args(0), if (args.length > 1) litInt(args(1), "k") else 200)),
    ("token_hist_agg",
      "token_hist_agg(tokens, bins, vocab) - token-id histogram (aggregate)",
      (args: Seq[Expression]) =>
        TokenHistAgg(args(0), litInt(args(1), "bins"), litInt(args(2), "vocab"))),
    ("char_class_counts",
      "char_class_counts(text) - struct(n_chars, n_alpha, n_digit, n_ws) in one walk",
      (args: Seq[Expression]) => graft.ops.CharClassCounts(args.head)),
    ("freq_items_agg",
      "freq_items_agg(word, maxMapSize) - heavy-hitters sketch (aggregate)",
      (args: Seq[Expression]) =>
        graft.stats.FreqItemsAgg(args(0),
          if (args.length > 1) litInt(args(1), "maxMapSize") else 4096)),
    ("cut_spans",
      "cut_spans(text, spans) - drop words inside (span_start, span_words) ranges",
      (args: Seq[Expression]) => graft.ops.CutSpans(args(0), args(1))),
    ("sig_agree",
      "sig_agree(a, b) - agreeing-position count of two bigint arrays (minhash est_jaccard numerator)",
      (args: Seq[Expression]) => graft.ops.SigAgree(args(0), args(1)))
  )

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Register into an existing session (tests / notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.graftbridge.FunctionBridge
        .register(spark, FunctionIdentifier(name), info(name, usage), builder)
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
}
