package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The doGenCode paths of the native expressions must actually COMPILE:
  * Spark's default `spark.sql.codegen.fallback=true` silently swaps a
  * Janino-failing plan to the interpreted path, so an ordinary spec
  * would stay green while every production projection quietly loses
  * whole-stage codegen. Here the expected values are computed first
  * under the default config, then the same projections re-run with
  * fallback DISABLED (a codegen failure throws) and compared.
  */
class CodegenForcedSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docsDf: DataFrame = Seq(
    (1L, "hello world 42 foo bar baz qux quux"),
    (2L, "a  b   c"), // consecutive spaces -> empty words
    (3L, "Mixed CASE text with 123 digits and\ttabs"),
    (4L, ""),
    (5L, "solo")).toDF("id", "text")

  private def vecsDf: DataFrame = Seq(
    (1L, Array(1.0f, 2.0f, -3.0f, 0.5f), Array(0.5f, -1.0f, 2.0f, 1.5f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, -2.0f, -3.0f, -4.0f), Array(1.0f, 2.0f, 3.0f, 4.0f)))
    .toDF("id", "va", "vb")

  private lazy val bpeModel = Bpe.trainFromCounts(
    Seq(("hello", 3L), ("world", 2L), ("foo", 2L), ("bar", 1L)), 5)

  /** Every codegen'd native expression in one projection per table. */
  private def nativeProjections(): Seq[Seq[org.apache.spark.sql.Row]] = {
    val spans = expr(
      "array(named_struct('span_start', 1L, 'span_words', 2L))")
    val d = docsDf.select(
      Bpe.encode(col("text"), bpeModel).as("bpe"),
      NgramLm.stats(col("text"),
        NgramLm.trainFromDocs(Seq("hello world", "foo bar world"))).as("lm"),
      CtLangId.classify(CtLangId.profile(col("text")),
        Seq("en" -> Seq("hel", "ell", "llo"), "xx" -> Seq("123", "23 "))).as("ct"),
      UrlOps.canonicalizeUrl(concat(lit("HTTP://WWW.Ex.COM:80/p?utm_x=1&q="),
        col("text"))).as("canon"),
      map_entries(CtLangId.ngramCounts(col("text"), 3)).as("ngc"),
      map_entries(NgramLm.wordNgramCounts(col("text"), 2)).as("wng"),
      UrlOps.registrableDomain(lit("http://a.b.site.co.uk/x")).as("dom"),
      TextOps.charClassCounts(col("text")).as("census"),
      ColumnsForTest.cutSpans(col("text"), spans).as("cut"),
      ShingleHashes.shingle_hashes(col("text"), 3).as("sh"),
      MinHash64.minhash(ShingleHashes.shingle_hashes(col("text"), 3), 8).as("mh"),
      SimHash64.simhash(ShingleHashes.shingle_hashes(col("text"), 3)).as("simh"),
      SigAgree.sig_agree(
        MinHash64.minhash(ShingleHashes.shingle_hashes(col("text"), 3), 8),
        MinHash64.minhash(ShingleHashes.shingle_hashes(col("text"), 2), 8)).as("agree"))
      .orderBy(col("census.n_chars"))
    val v = vecsDf.select(
      Similarity.cosine(col("va"), col("vb")).as("cos"),
      Similarity.rhpSignature(col("va"), 6, 7L).as("rhp"),
      Ivf.nearestCell(col("va"), Array(
        Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
        Array(-1f, -1f, -1f, -1f))).as("cell"))
      .orderBy(col("rhp"))
    val m = Seq(
      (Seq(1, 2, 3), 3), (Seq(1, -5, 3), 2), (Seq.empty[Int], 0))
      .toDF("tokens", "n_tok")
      .select(graft.sequences.ViolationMask.violation_mask(
        col("tokens"), col("n_tok"), vocab = 100, minNtok = 1, maxNtok = 10)
        .as("mask"))
      .orderBy(col("mask"))
    Seq(d.collect().toSeq, v.collect().toSeq, m.collect().toSeq)
  }

  test("native expressions compile and agree under forced codegen") {
    val expected = nativeProjections() // default config (fallback allowed)
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val prevExcluded = conf.getOption("spark.sql.optimizer.excludedRules")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    // without this, ConvertToLocalRelation evaluates the projection over
    // the local Seq INTERPRETED at optimization time and the test would
    // be vacuous — no generated code would ever compile
    conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val forced = nativeProjections() // a Janino failure now THROWS
      assert(forced == expected,
        "forced-codegen results must equal the default-config results")
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      prevExcluded.fold(conf.unset("spark.sql.optimizer.excludedRules"))(
        conf.set("spark.sql.optimizer.excludedRules", _))
    }
  }
}

/** Column constructor for the CutSpans expression (the public API routes
  * through DupSpans.cutSpans, which wants a mined spans FRAME; this spec
  * needs the raw expression over a literal spans column).
  */
private object ColumnsForTest {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def cutSpans(text: Column, spans: Column): Column =
    ColumnBridge.column(CutSpans(
      ColumnBridge.expression(text), ColumnBridge.expression(spans)))
}
