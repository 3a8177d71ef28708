package graft.sequences

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesizer of the engine's primary input table
  * `(doc_id string, tokens array<int>, n_tok int, source string)`
  * (BASELINE.json input_hint), with planted violations as exact,
  * recomputable ground truth.
  *
  * Everything is derived from `(seed, id)` through Catalyst expressions
  * (xxhash64), so generation is fully distributed, O(1) driver memory, and
  * reproducible at any scale — the same recipe generates 10^4 rows for a
  * unit test or 10^12 on a cluster, and a test can re-derive any row's
  * expected token array from its id alone.
  *
  * Violation classes (disjoint id-residue families):
  *  - duplicate doc_id     (uniqueness constraint)
  *  - source not in dim    (referential constraint)
  *  - n_tok != size(tokens) (row-level consistency)
  *  - token outside vocab  (declared-bounds fit)
  *  - null token element   (nullability)
  *  - drifted n_tok law on one source (distribution drift)
  */
object SequenceSynth {

  final case class Config(
      rows: Long,
      seed: Long = 42L,
      vocabSize: Int = 50000,
      minNtok: Int = 16,
      maxNtok: Int = 512,
      /** weighted sources; "web" is hot (skew scenario) */
      sourceWeights: Seq[(String, Double)] =
        Seq("web" -> 0.80, "books" -> 0.10, "code" -> 0.06, "chat" -> 0.04),
      dupEvery: Long = 211L,        // 0 = disabled
      orphanEvery: Long = 997L,
      ntokMismatchEvery: Long = 499L,
      oovEvery: Long = 751L,
      nullTokEvery: Long = 1201L,
      /** source whose n_tok distribution is drifted (planted drift) */
      driftSource: Option[String] = Some("chat"))

  private def u01(h: Column): Column = pmod(h, lit(1000000000L)) / 1e9

  /** The sequences table as a lazily-planned DataFrame. */
  def sequences(spark: SparkSession, cfg: Config): DataFrame = {
    val base = spark.range(0L, cfg.rows)
    val id = col("id")
    val h = (salt: Int) => xxhash64(id, lit(cfg.seed), lit(salt))

    // --- source: weighted pick, planted orphans ---------------------------
    val uSrc = u01(h(1))
    val cum = cfg.sourceWeights.scanLeft(0.0)(_ + _._2).tail
    val sourcePick = cfg.sourceWeights.zip(cum).reverse
      .foldLeft(lit(cfg.sourceWeights.last._1)) { case (acc, ((name, _), c)) =>
        when(uSrc < c, name).otherwise(acc)
      }
    val source =
      if (cfg.orphanEvery > 0)
        when(pmod(id, lit(cfg.orphanEvery)) === 13L, "ghost").otherwise(sourcePick)
      else sourcePick

    // --- n_tok: power-law-ish in [minNtok, maxNtok]; drift plants a
    //     different exponent on one source --------------------------------
    val uN = u01(h(2))
    val span = (cfg.maxNtok - cfg.minNtok).toDouble
    def ntokOf(exponent: Double): Column =
      (lit(cfg.minNtok) + pow(uN, exponent) * span).cast("int")
    val nTokTrue = cfg.driftSource match {
      case Some(s) => when(col("source") === s, ntokOf(0.8)).otherwise(ntokOf(2.0))
      case None    => ntokOf(2.0)
    }

    // --- doc_id: planted duplicates point back dupEvery ids ---------------
    // dup rows point at the previous id NOT in the dup family (id%e==1),
    // so every planted duplicate doubles a distinct, otherwise-unique key
    val effectiveId =
      if (cfg.dupEvery > 0)
        when(pmod(id, lit(cfg.dupEvery)) === 0L && id > 0L,
          id - cfg.dupEvery + 1).otherwise(id)
      else id
    val docId = format_string("doc%014d", effectiveId)

    // --- tokens: per-position hash in [0, vocab); planted anomalies -------
    // token(i) = xxhash64(id, seed, 7, i) mod vocab — computed by the
    // native GenTokens expression (bit-identical to the transform/xxhash64
    // composition, ~10x faster than per-element interpreted lambdas)
    val baseTokens = GenTokens.gen_tokens(id, col("n_tok_true"), cfg.seed, cfg.vocabSize)
    val withOov =
      if (cfg.oovEvery > 0)
        when(pmod(id, lit(cfg.oovEvery)) === 11L,
          concat(slice(col("tokens0"), lit(1), size(col("tokens0")) - 1),
            array((lit(cfg.vocabSize) + pmod(id, lit(100)).cast("int") + 1).cast("int"))))
          .otherwise(col("tokens0"))
      else col("tokens0")
    // null goes in position 1 (oov went to the LAST position) so the two
    // plantings never mask each other on ids in both residue families
    val withNull =
      if (cfg.nullTokEvery > 0)
        when(pmod(id, lit(cfg.nullTokEvery)) === 17L,
          concat(array(lit(null).cast("int")),
            slice(col("tokens1"), lit(2), size(col("tokens1")) - 1)))
          .otherwise(col("tokens1"))
      else col("tokens1")

    // --- n_tok column: mostly size(tokens), planted off-by-one ------------
    val nTokCol =
      if (cfg.ntokMismatchEvery > 0)
        when(pmod(id, lit(cfg.ntokMismatchEvery)) === 7L, col("n_tok_true") + 1)
          .otherwise(col("n_tok_true"))
      else col("n_tok_true")

    base
      .withColumn("source", source)
      .withColumn("n_tok_true", nTokTrue)
      .withColumn("tokens0", baseTokens)
      .withColumn("tokens1", withOov)
      .withColumn("tokens", withNull)
      .withColumn("n_tok", nTokCol)
      .withColumn("doc_id", docId)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
  }

  /** Companion dim table for the referential + declared-bounds checks. */
  def sourcesDim(spark: SparkSession, cfg: Config): DataFrame = {
    import spark.implicits._
    cfg.sourceWeights.map { case (name, _) =>
      (name, cfg.minNtok, cfg.maxNtok + 1, cfg.vocabSize)
    }.toDF("source", "expected_min_ntok", "expected_max_ntok", "vocab_size")
  }

  /** Write as an Iceberg-style layout: hive-partitioned parquet on
    * `source`, with `buckets` files per partition so a hot source still
    * writes (and later scans) in parallel.
    */
  def write(spark: SparkSession, cfg: Config, path: String, buckets: Int = 8): Unit = {
    sequences(spark, cfg)
      .repartition(col("source"), pmod(xxhash64(col("doc_id")), lit(buckets)))
      .write.mode("overwrite")
      .partitionBy("source")
      .parquet(path)
  }

  /** Exact ground truth for the planted violations of `cfg`, derived from
    * the same id-residue families — used by tests and demo assertions.
    */
  def expectedViolationCounts(cfg: Config): Map[String, Long] = {
    def countResidue(every: Long, residue: Long): Long =
      if (every <= 0) 0L
      else {
        val full = cfg.rows / every
        val rem = cfg.rows % every
        full + (if (residue < rem) 1L else 0L)
      }
    val dups = // id > 0 with id % dupEvery == 0
      if (cfg.dupEvery <= 0) 0L
      else math.max(0L, (cfg.rows - 1) / cfg.dupEvery)
    Map(
      "uniqueness"    -> dups,
      "referential"   -> countResidue(cfg.orphanEvery, 13L),
      "ntok_mismatch" -> countResidue(cfg.ntokMismatchEvery, 7L),
      "oov_token"     -> countResidue(cfg.oovEvery, 11L),
      "null_token"    -> countResidue(cfg.nullTokEvery, 17L)
    )
  }
}
