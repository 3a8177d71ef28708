package graft.constraints

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.sequences.SequenceSynth

class ValidatorSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  val cfg = SequenceSynth.Config(rows = 20000)
  val suite = Validator.SuiteConfig(
    vocabSize = cfg.vocabSize, minNtok = cfg.minNtok, maxNtok = cfg.maxNtok + 1)
  lazy val df = SequenceSynth.sequences(spark, cfg).cache()
  lazy val dim = SequenceSynth.sourcesDim(spark, cfg)
  lazy val report = Validator.validate(spark, df, dim, suite)
  lazy val verdicts = report.verdicts.collect()
    .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
  lazy val expected = SequenceSynth.expectedViolationCounts(cfg)

  test("violation rows carry identity + every failed check, with exact totals") {
    val byCheck = report.violations
      .select(explode(col("checks")).as("check"))
      .groupBy("check").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCheck("ntok_mismatch") == expected("ntok_mismatch"))
    assert(byCheck("null_token") == expected("null_token"))
    assert(byCheck("oov_token") == expected("oov_token"))
    assert(!byCheck.contains("ntok_bounds"))
  }

  test("token-ID distribution drift fires on a shifted-vocabulary source only") {
    import spark.implicits._
    // synth tokens are uniform over the vocab for every source -> no drift
    assert(verdicts(("chat", "token_drift")))
    assert(verdicts(("web", "token_drift")))
    // a source whose tokens concentrate at the top of the vocab drifts
    val shifted = (0 until 1000).map { i =>
      (f"drift$i%05d", Seq.fill(40)(cfg.vocabSize - 1 - (i % 100)), 40, "driftsrc")
    }.toDF("doc_id", "tokens", "n_tok", "source")
    val rep = Validator.validate(spark, df.unionByName(shifted), dim, suite)
    val v = rep.verdicts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(!v(("driftsrc", "token_drift")))
    assert(v(("web", "token_drift")))
    assert(v(("books", "token_drift")))
  }

  test("completeness: a dim source with no data fails; populated sources pass") {
    // present sources pass on the default report
    assert(verdicts(("web", "completeness")))
    assert(verdicts(("chat", "completeness")))
    // drop one source's data entirely -> its dim row fails completeness
    val rep = Validator.validate(spark, df.filter(col("source") =!= "books"), dim, suite)
    val v = rep.verdicts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(!v(("books", "completeness")))
    assert(v(("web", "completeness")))
  }

  test("violation examples are capped per (source, check) and deterministic") {
    val ex = Validator.violationExamples(df, suite.copy(violationSampleCap = 3))
    val counts = ex.groupBy("source", "check").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(2) <= 3, r.toString))
    // the kept examples are the smallest doc_ids of the full set
    val fullTop = Validator.violations(df, suite)
      .withColumn("check", explode(col("checks")))
      .filter(col("source") === "web" && col("check") === "oov_token")
      .orderBy(col("doc_id")).limit(3)
      .select("doc_id").collect().map(_.getString(0)).toSeq
    val got = ex.filter(col("source") === "web" && col("check") === "oov_token")
      .orderBy(col("doc_id")).select("doc_id").collect().map(_.getString(0)).toSeq
    assert(got == fullTop)
  }

  test("hot-source skew: range balance evens partitions; verdicts layout-invariant") {
    val hotCfg = SequenceSynth.Config(rows = 20000,
      sourceWeights = Seq("web" -> 0.94, "books" -> 0.02, "code" -> 0.02, "chat" -> 0.02))
    val hot = SequenceSynth.sequences(spark, hotCfg)
      // pathological layout: everything hashed on source -> one fat partition
      .repartition(16, col("source"))
      .cache()
    val balanced = Validator.balance(hot, 16).cache()
    def partSizes(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.groupBy(spark_partition_id()).count().collect().map(_.getLong(1)).toSeq
    val before = partSizes(hot)
    val after = partSizes(balanced)
    assert(before.max >= 0.9 * 20000, s"hot layout not skewed: $before")
    assert(after.max <= 3000, s"range partitioner left a straggler: $after")
    // results are layout-invariant
    val hotDim = SequenceSynth.sourcesDim(spark, hotCfg)
    val hotSuite = Validator.SuiteConfig(vocabSize = hotCfg.vocabSize,
      minNtok = hotCfg.minNtok, maxNtok = hotCfg.maxNtok + 1)
    val a = Validator.validate(spark, hot, hotDim, hotSuite).verdicts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    val b = Validator.validate(spark, balanced, hotDim, hotSuite).verdicts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(a == b)
  }

  test("dim-table declared bounds: oov-planted source fails, spec-less dims skip") {
    // the dim carries (expected_min_ntok, expected_max_ntok, vocab_size);
    // web has planted oov tokens -> its dim_bounds verdict fails
    assert(!verdicts(("web", "dim_bounds")))
    // a dim WITHOUT the spec columns produces no dim_bounds verdicts
    import spark.implicits._
    val bareDim = Seq("web", "books", "code", "chat").toDF("source")
    val rep = Validator.validate(spark, df, bareDim, suite)
    assert(!rep.verdicts.collect().exists(_.getString(1) == "dim_bounds"))
    // a NULL spec VALUE skips that source's check (must not unbox to 0
    // and fail everything); sources with full specs are still checked
    val nullSpecDim = dim.withColumn("vocab_size",
      when(col("source") === "books", lit(null).cast("int"))
        .otherwise(col("vocab_size")))
    val rep2 = Validator.validate(spark, df, nullSpecDim, suite)
    val db = rep2.verdicts.collect()
      .filter(_.getString(1) == "dim_bounds").map(_.getString(0)).toSet
    assert(!db.contains("books") && db.contains("web"), db.toString)
  }

  test("suggested DDL is the narrowest column fitting the observed stats") {
    val stats = Validator.sourceStats(df, suite).collect()
    val ddl = Validator.suggestDdl(stats)
      .map { case (s, c, _, d) => (s, c) -> d }.toMap
    // doc_id is a fixed-width hex-ish string -> varchar(maxLen)
    val maxLen = stats.map(_.getAs[Integer]("max_docid_len").toInt).max
    assert(ddl(("web", "doc_id")) == s"varchar($maxLen)")
    // n_tok fits an int everywhere
    assert(ddl(("web", "n_tok")) == "int")
    assert(ddl(("web", "tokens_element")) == "int")
  }

  test("per-source verdicts fail exactly where violations were planted") {
    // ghost partition fails referential; real sources pass
    assert(!verdicts(("ghost", "referential")))
    assert(verdicts(("web", "referential")))
    // drift planted on chat only
    assert(!verdicts(("chat", "ntok_drift")))
    assert(verdicts(("web", "ntok_drift")))
    assert(verdicts(("books", "ntok_drift")))
    // uniqueness is a global verdict
    assert(!verdicts(("*", "uniqueness")))
    // oov tokens break the vocab_fit declared-bounds check on big sources
    assert(!verdicts(("web", "vocab_fit")))
  }

  test("exact global duplicate detection matches planted ground truth") {
    val dups = Validator.duplicateKeys(df)
    assert(dups.count() == expected("uniqueness"))
    assert(dups.agg(max("n")).collect()(0).getLong(0) == 2L)
  }

  test("salted two-phase duplicate counting agrees with the direct groupBy") {
    val direct = Validator.duplicateKeys(df)
      .select(col("doc_id"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Validator.duplicateKeysSalted(df, saltBuckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("declared-fit (wider?) verdicts: defaults pass, tight DDL fails") {
    assert(verdicts(("web", "declared_fit_doc_id")))
    assert(verdicts(("web", "declared_fit_n_tok")))
    assert(verdicts(("web", "declared_fit_tokens_element")))
    val tight = suite.copy(declaredDdl = Map(
      "doc_id" -> "varchar(8)",       // doc ids are 17 chars -> truncation
      "n_tok" -> "smallint"))         // fits
    val rep = Validator.validate(spark, df, dim, tight)
    val vs = rep.verdicts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(!vs(("web", "declared_fit_doc_id")))
    assert(vs(("web", "declared_fit_n_tok")))
  }

  test("a clean table passes every constraint") {
    val clean = SequenceSynth.Config(rows = 5000, dupEvery = 0, orphanEvery = 0,
      ntokMismatchEvery = 0, oovEvery = 0, nullTokEvery = 0, driftSource = None)
    val rep = Validator.validate(spark,
      SequenceSynth.sequences(spark, clean),
      SequenceSynth.sourcesDim(spark, clean),
      Validator.SuiteConfig(vocabSize = clean.vocabSize,
        minNtok = clean.minNtok, maxNtok = clean.maxNtok + 1))
    val vs = rep.verdicts.collect()
    assert(vs.nonEmpty && vs.forall(_.getBoolean(2)),
      vs.filterNot(_.getBoolean(2)).mkString("; "))
    assert(rep.violations.isEmpty)
  }
}
