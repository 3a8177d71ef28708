package graft.constraints

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.stats.{Drift, KllSketchAgg}

/** The constraint-validation suite over the tokenized-sequence table —
  * the scale-out re-expression of the reference's schema-diagnosis
  * use-case (README.md:86-104: detect truncation/mismatch BEFORE loading,
  * by comparing observed schema vs declared schema), with the reference's
  * two reporting channels: per-partition pass/fail verdicts (the
  * `analyze-json-schema` summary, core.clj:57-67) and violation rows with
  * identity + reason (the parser's failed-lines channel, parser.clj:9-28).
  *
  * Execution shape (designed for 10^12 rows / 1000 executors):
  *  - ONE full-data scan computes all row-level flags AND per-source stat
  *    sketches: flags are plain Catalyst expressions (whole-stage codegen),
  *    the groupBy(source) aggregation is partially aggregated map-side, so
  *    the only full shuffle ships a handful of sketch rows per input
  *    partition, never data rows.
  *  - Violation rows are a filter over the same scan (no extra pass; the
  *    filter and the agg share the scan via one job each over a cached
  *    columnar batch or two parquet scans — at scale two scans of pruned
  *    columns beat caching 100 TB).
  *  - Global exact uniqueness is the one unavoidable wide shuffle; it
  *    projects (doc_id, source) only — ~1% of table width — and relies on
  *    AQE to coalesce/split skewed partitions. A cheap HLL pre-check per
  *    source allows skipping it when estimated distinct == rows.
  *  - Referential, drift (PSI/KS over merged KLL sketches), and
  *    declared-fit verdicts are computed driver-side from the per-source
  *    sketch table (KBs, independent of data size).
  */
object Validator {

  final case class SuiteConfig(
      vocabSize: Int = 50000,
      minNtok: Int = 16,
      maxNtok: Int = 513,
      kllK: Int = 200,
      psiThreshold: Double = 0.25,
      ksThreshold: Double = 0.30,
      /** token-ID distribution drift: histogram bins + PSI threshold */
      tokenHistBins: Int = 64,
      tokenPsiThreshold: Double = 0.25,
      /** run the exact global uniqueness shuffle (vs HLL estimate only) */
      exactUniqueness: Boolean = true,
      /** uniqueness exchange strategy for [[Validator.validateOneScan]]:
        * false (default) groups the key column directly — one scan, one
        * exchange of the keys; measured fastest on a single node where
        * shuffle is a memcpy. true uses [[Validator.duplicateKeysHashFirst]]
        * — two narrow scans but the wide exchange ships 8-byte hashes
        * instead of key strings; the right trade on a network-bound
        * cluster where exchange BYTES, not scans, are the ceiling.
        */
      uniquenessHashFirst: Boolean = false,
      /** cap violation rows sampled per check (driver/report safety) */
      violationSampleCap: Int = 10000,
      /** declared column DDL (reference db_types side door): observed
        * stats are checked against these capacities with the `wider?`
        * truncation predicate (db_types/common.clj:20-115)
        */
      declaredDdl: Map[String, String] = Map(
        "doc_id" -> "varchar(32)",
        "n_tok" -> "int",
        "tokens_element" -> "int"),
      ddlDialect: graft.dbtypes.DbTypeTranslator = graft.dbtypes.MySqlTranslator)

  final case class ValidationReport(
      verdicts: DataFrame,
      violations: DataFrame,
      sourceStats: DataFrame)

  /** Names of the row-level checks, in flag order. */
  val rowChecks: Seq[String] =
    Seq("ntok_mismatch", "null_token", "oov_token", "ntok_bounds")

  /** Token-array statistics in ONE native pass per row (size, null count,
    * min, max) — replaces five interpreted higher-order-function walks of
    * the array; see [[graft.sequences.TokenStats]].
    */
  private def withTokenStats(df: DataFrame): DataFrame =
    df.withColumn("__ts",
      graft.sequences.TokenStats.token_stats(col("tokens")))

  /** Row-level violation flags over the precomputed token stats. */
  def rowFlags(cfg: SuiteConfig): Seq[(String, Column)] = Seq(
    "ntok_mismatch" -> (col("n_tok") =!= col("__ts.n")),
    "null_token"    -> (col("__ts.n_null") > 0),
    "oov_token" -> coalesce(
      col("__ts.min") < 0 || col("__ts.max") >= cfg.vocabSize, lit(false)),
    "ntok_bounds" -> (col("n_tok") < cfg.minNtok || col("n_tok") > cfg.maxNtok)
  )

  /** Violation rows: identity + failed checks, from one pruned scan.
    * The filter evaluates ONE native [[graft.sequences.ViolationMask]]
    * walk per row (predicate pushdown would inline a shared token_stats
    * alias into five walks per row); the reasons array and n_tokens are
    * decoded from the mask / array header only for the surviving (rare)
    * rows. [[violationsComposed]] is the composed-expressions twin,
    * pinned row-identical by SuiteStatsSpec.
    */
  def violations(df: DataFrame, cfg: SuiteConfig): DataFrame = {
    val mask = graft.sequences.ViolationMask.violation_mask(
      col("tokens"), col("n_tok"), cfg.vocabSize, cfg.minNtok, cfg.maxNtok)
    val reasons = array_compact(array(rowChecks.zipWithIndex.map {
      case (name, bit) =>
        when((col("__m").bitwiseAND(lit(1 << bit))) =!= 0, lit(name))
          .otherwise(lit(null))
    }: _*))
    df.withColumn("__m", mask)
      .filter(col("__m") =!= 0)
      .select(col("doc_id"), col("source"), col("n_tok"),
        size(col("tokens")).as("n_tokens"), reasons.as("checks"))
  }

  /** Composed-builtins twin of [[violations]] (the semantic definition). */
  private[graft] def violationsComposed(df: DataFrame, cfg: SuiteConfig): DataFrame = {
    val flags = rowFlags(cfg)
    val anyFlag = flags.map { case (_, c) => coalesce(c, lit(false)) }
      .reduce(_ || _)
    val reasons = array_compact(array(flags.map { case (name, c) =>
      when(coalesce(c, lit(false)), lit(name)).otherwise(lit(null))
    }: _*))
    withTokenStats(df)
      .filter(anyFlag)
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("__ts.n").as("n_tokens"), reasons.as("checks"))
  }

  /** Bounded violation EXAMPLES per (source, check) — the report channel.
    * At 10^12 rows the full violation set can itself be TB-sized when a
    * check fires broadly; totals come from [[sourceStats]] counters, the
    * report carries a deterministic bounded sample of identities (the
    * reference's distinct-coverage accumulator semantics,
    * example_data.clj:36-92: keep representatives, stop when covered).
    * One shuffle keyed (source, check); rank by doc_id for determinism.
    */
  def violationExamples(df: DataFrame, cfg: SuiteConfig): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("check")).orderBy(col("doc_id"))
    violations(df, cfg)
      .withColumn("check", explode(col("checks")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cfg.violationSampleCap)
      .drop("__rn", "checks")
  }

  /** Per-source observed stats + mergeable sketches — the engine's
    * "observed schema with metadata" (extract-then-merge, core.clj:22-27),
    * one row per source partition. Fused single-walk aggregate (see
    * [[SuiteStatsAgg]]); [[sourceStatsComposed]] is the composed-builtins
    * semantic twin, pinned equal by SuiteStatsSpec.
    */
  def sourceStats(df: DataFrame, cfg: SuiteConfig): DataFrame =
    df.groupBy(col("source"))
      .agg(SuiteStatsAgg.suite_stats(
        col("doc_id"), col("tokens"), col("n_tok"), cfg).as("__s"))
      .select(col("source") +: SuiteStatsAgg.schema.fieldNames.toSeq
        .map(f => col(s"__s.$f").as(f)): _*)

  /** The composed-builtins formulation of [[sourceStats]] — 16 aggregate
    * expressions over two token-array walks (TokenStats + TokenHistAgg).
    */
  private[graft] def sourceStatsComposed(df: DataFrame, cfg: SuiteConfig): DataFrame = {
    val flags = rowFlags(cfg).toMap
    withTokenStats(df).groupBy(col("source")).agg(
      count(lit(1)).as("n_rows"),
      count_if(coalesce(flags("ntok_mismatch"), lit(true))).as("n_ntok_mismatch"),
      count_if(coalesce(flags("null_token"), lit(false))).as("n_null_token"),
      count_if(coalesce(flags("oov_token"), lit(false))).as("n_oov_token"),
      count_if(coalesce(flags("ntok_bounds"), lit(true))).as("n_ntok_bounds"),
      count_if(col("doc_id").isNull).as("n_null_docid"),
      min(col("n_tok")).as("min_ntok"),
      max(col("n_tok")).as("max_ntok"),
      min(col("__ts.min")).as("min_token"),
      max(col("__ts.max")).as("max_token"),
      min(length(col("doc_id"))).as("min_docid_len"),
      max(length(col("doc_id"))).as("max_docid_len"),
      // estimate derives from the same physical sketch aggregate (Spark
      // dedups the identical agg expression) — no second per-row hash
      hll_sketch_estimate(hll_sketch_agg(col("doc_id")))
        .cast("long").as("approx_distinct_docid"),
      hll_sketch_agg(col("doc_id")).as("hll_docid"),
      KllSketchAgg.kll_sketch(col("n_tok"), cfg.kllK).as("kll_ntok"),
      graft.stats.TokenHistAgg.token_hist(col("tokens"),
        cfg.tokenHistBins, cfg.vocabSize).as("hist_token"))
  }

  /** Explicit skew tamer for pathological input layouts: range-partition
    * on (source, doc_id). Hash partitioning on source alone puts a 90%-hot
    * source behind one task; the range partitioner SAMPLES the key
    * distribution and splits the hot source across contiguous doc_id
    * ranges, so map-heavy stages (the violations scan, feature passes)
    * lose their stragglers. Aggregation results are layout-invariant
    * (the stats monoid merges per source regardless), so this is purely a
    * wall-clock lever — apply it when the upstream layout is skewed, skip
    * it when the scan is already balanced (it costs one full shuffle).
    */
  def balance(df: DataFrame, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, col("source"), col("doc_id"))

  /** Exact global duplicate keys: the one wide shuffle, over a two-column
    * projection. Returns (doc_id, n, sources).
    */
  def duplicateKeys(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), collect_set(col("source")).as("sources"))
      .filter(col("n") > 1)

  /** Exact duplicate keys with a HASH-FIRST shuffle: phase 1 groups by
    * `xxhash64(doc_id)` so the wide exchange ships 8-byte longs instead of
    * key strings (5x+ narrower here; the win grows with key width — URLs,
    * content IDs). Phase 2 exactly re-groups by the real doc_id ONLY the
    * rows whose hash bucket held more than one row — 64-bit collisions
    * between distinct keys are separated there (and at 10^12 rows they DO
    * occur, ~n^2/2^65 of them), so the result is exact, identical to
    * [[duplicateKeys]] minus the `sources` column. The candidate set is
    * violation-rare in healthy data, so phase 2's join broadcasts (AQE)
    * and its groupBy shuffles almost nothing.
    */
  def duplicateKeysHashFirst(df: DataFrame): DataFrame = {
    val keyed = df.select(col("doc_id"), xxhash64(col("doc_id")).as("__h"))
    val dupHashes = keyed.groupBy(col("__h"))
      .agg(count(lit(1)).as("hn")).filter(col("hn") > 1).select("__h")
    keyed.join(dupHashes, "__h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
  }

  /** Salted two-phase exact duplicate counting for HOT keys: when a single
    * doc_id may repeat millions of times, a plain groupBy(doc_id) puts one
    * reducer behind the hot key. Phase 1 counts per (doc_id, salt) where
    * salt = partition id (deterministic, no data movement semantics), so
    * the hot key is spread over `saltBuckets` reducers; phase 2 sums the
    * per-salt partials — its input has at most saltBuckets rows per key.
    * Returns (doc_id, n) for keys with n > 1.
    */
  def duplicateKeysSalted(df: DataFrame, saltBuckets: Int = 64): DataFrame =
    df.select(col("doc_id"),
        pmod(spark_partition_id(), lit(saltBuckets)).as("__salt"))
      .groupBy(col("doc_id"), col("__salt"))
      .agg(count(lit(1)).as("pn"))
      .groupBy(col("doc_id"))
      .agg(sum(col("pn")).as("n"))
      .filter(col("n") > 1)

  /** Assemble the full report. `stats` must be the (possibly
    * resume-merged) per-source stats; `dim` is the sources dimension.
    */
  def buildVerdicts(
      spark: SparkSession,
      stats: Array[Row],
      dim: Array[Row],
      dupStats: Option[(Long, Long)], // (n duplicated keys, n extra rows)
      cfg: SuiteConfig): DataFrame = {
    import spark.implicits._

    val dimSources = dim.map(_.getAs[String]("source")).toSet
    val bySource = stats.map(r => r.getAs[String]("source") -> r).toMap

    def vRow(source: String, check: String, pass: Boolean,
             observed: String, expected: String): (String, String, Boolean, String, String) =
      (source, check, pass, observed, expected)

    val perSource = stats.flatMap { r =>
      val s = r.getAs[String]("source")
      val nRows = r.getAs[Long]("n_rows")
      def cnt(fld: String) = r.getAs[Long](fld)

      val rowLevel = Seq(
        ("ntok_mismatch", cnt("n_ntok_mismatch")),
        ("null_token", cnt("n_null_token")),
        ("oov_token", cnt("n_oov_token")),
        ("ntok_bounds", cnt("n_ntok_bounds")),
        ("null_docid", cnt("n_null_docid"))
      ).map { case (check, bad) =>
        vRow(s, check, bad == 0L, s"$bad/$nRows violating rows", "0 violations")
      }

      val referential = vRow(s, "referential", dimSources.contains(s),
        s"source '$s' ($nRows rows)", s"source in dim(${dimSources.size})")

      // declared-fit: observed ranges must sit inside declared bounds —
      // the reference's `wider?` truncation predicate re-expressed over
      // observed stats (db_types/common.clj:20-115)
      val fit = {
        val minT = Option(r.getAs[Integer]("min_token")).map(_.toInt)
        val maxT = Option(r.getAs[Integer]("max_token")).map(_.toInt)
        val obs = s"tokens in [${minT.getOrElse("-")},${maxT.getOrElse("-")}]"
        val pass = maxT.forall(_ < cfg.vocabSize) && minT.forall(_ >= 0)
        vRow(s, "vocab_fit", pass, obs, s"[0,${cfg.vocabSize})")
      }

      // observed-vs-declared truncation risk: the reference's README
      // use-case (README.md:86-104), evaluated from stats alone
      val declaredFit = {
        import graft.types.{IntT, StrT}
        def observed(colName: String): Option[graft.types.SchemaType] = colName match {
          case "doc_id" =>
            for {
              mn <- Option(r.getAs[Integer]("min_docid_len"))
              mx <- Option(r.getAs[Integer]("max_docid_len"))
            } yield StrT(mn.toLong, mx.toLong)
          case "n_tok" =>
            for {
              mn <- Option(r.getAs[Integer]("min_ntok"))
              mx <- Option(r.getAs[Integer]("max_ntok"))
            } yield IntT(BigInt(mn.toInt), BigInt(mx.toInt))
          case "tokens_element" =>
            for {
              mn <- Option(r.getAs[Integer]("min_token"))
              mx <- Option(r.getAs[Integer]("max_token"))
            } yield IntT(BigInt(mn.toInt), BigInt(mx.toInt))
          case _ => None
        }
        cfg.declaredDdl.toSeq.sortBy(_._1).flatMap { case (colName, ddl) =>
          observed(colName).map { obs =>
            val declared = cfg.ddlDialect.colTypeToSchemaType(ddl)
            val pass = graft.dbtypes.Wider.eqWidthOrNarrower(obs, declared)
            vRow(s, s"declared_fit_$colName", pass,
              graft.types.SchemaType.render(obs),
              s"fits $ddl (${graft.types.SchemaType.render(declared)})")
          }
        }
      }

      rowLevel ++ declaredFit :+ referential :+ fit
    }

    // drift: each source's n_tok KLL vs the pooled rest. NB: KLL compaction
    // is internally randomized (datasketches), so the PSI/KS *readouts* may
    // vary in trailing decimals across runs; the pass/fail decision is what
    // the engine guarantees stable (thresholds sit far from noise).
    val drift = {
      val sketches = stats.map { r =>
        r.getAs[String]("source") -> r.getAs[Array[Byte]]("kll_ntok")
      }.sortBy(_._1)
      sketches.map { case (s, bytes) =>
        val self = KllSketchAgg.fromBytes(bytes)
        val rest = KllSketchAgg.mergeBytes(
          sketches.collect { case (o, b) if o != s => b }, cfg.kllK)
        val psi = Drift.psi(rest, self)
        val ks = Drift.ks(rest, self)
        vRow(s, "ntok_drift", psi <= cfg.psiThreshold && ks <= cfg.ksThreshold,
          f"PSI=$psi%.4f KS=$ks%.4f",
          f"PSI<=${cfg.psiThreshold} KS<=${cfg.ksThreshold}")
      }.toSeq
    }

    // declared bounds from the DIM TABLE (constraint spec as data, not
    // config): sources(expected_min_ntok, expected_max_ntok exclusive,
    // vocab_size) -> observed ranges must fit. Skipped when the caller's
    // dim lacks the spec columns.
    val dimBounds: Map[String, (Int, Int, Int)] = dim.flatMap { d =>
      val f = d.schema.fieldNames.toSet
      if (Set("expected_min_ntok", "expected_max_ntok", "vocab_size").subsetOf(f)) {
        // a NULL spec value means "no bound declared for this source" —
        // skip the check rather than letting the null unbox to 0 and
        // produce bogus verdicts (every source failing tokens < 0)
        def oi(n: String): Option[Int] = Option(d.getAs[Integer](n)).map(_.toInt)
        for (lo <- oi("expected_min_ntok"); hi <- oi("expected_max_ntok");
             vs <- oi("vocab_size"))
          yield d.getAs[String]("source") -> ((lo, hi, vs))
      } else None
    }.toMap
    val dimFit = stats.flatMap { r =>
      val s = r.getAs[String]("source")
      dimBounds.get(s).map { case (lo, hiExcl, vs) =>
        def oi(f: String) = Option(r.getAs[Integer](f)).map(_.toInt)
        val pass =
          oi("min_ntok").forall(_ >= lo) && oi("max_ntok").forall(_ < hiExcl) &&
          oi("min_token").forall(_ >= 0) && oi("max_token").forall(_ < vs)
        vRow(s, "dim_bounds", pass,
          s"n_tok[${oi("min_ntok").getOrElse("-")},${oi("max_ntok").getOrElse("-")}] " +
            s"tokens[${oi("min_token").getOrElse("-")},${oi("max_token").getOrElse("-")}]",
          s"n_tok in [$lo,$hiExcl) tokens in [0,$vs)")
      }
    }.toSeq

    // completeness (reverse referential): every dim source must have data
    // — a silently missing partition is the upload failure the reference's
    // diagnosis use-case exists to catch before training reads the table
    val completeness = dim.map(_.getAs[String]("source")).sorted.map { s =>
      bySource.get(s) match {
        case Some(r) =>
          vRow(s, "completeness", pass = true,
            s"${r.getAs[Long]("n_rows")} rows observed", ">0 rows per dim source")
        case None =>
          vRow(s, "completeness", pass = false,
            "0 rows observed", ">0 rows per dim source")
      }
    }.toSeq

    // token-ID distribution drift: each source's token histogram vs the
    // pooled rest (vector-add of the other sources' histograms — the same
    // self-vs-rest design as the n_tok KLL drift, but over the payload)
    val tokenDrift = {
      val hists = stats.map { r =>
        // collection.Seq: fused-agg rows surface mutable.ArraySeq here
        r.getAs[String]("source") ->
          r.getAs[scala.collection.Seq[Long]]("hist_token").toArray
      }.sortBy(_._1)
      hists.map { case (s, self) =>
        val rest = hists.collect { case (o, h) if o != s => h }
          .reduceOption(graft.stats.TokenHistAgg.add)
          .getOrElse(new Array[Long](self.length))
        val psi = Drift.psiCounts(rest, self)
        vRow(s, "token_drift", psi <= cfg.tokenPsiThreshold,
          f"PSI=$psi%.4f over ${self.length} id-range bins",
          f"PSI<=${cfg.tokenPsiThreshold}")
      }.toSeq
    }

    val global = dupStats.toSeq.map { case (nKeys, nExtra) =>
      vRow("*", "uniqueness", nKeys == 0L,
        s"$nKeys duplicated doc_ids ($nExtra extra rows)", "all doc_ids unique")
    }

    (perSource.toSeq ++ dimFit ++ completeness ++ drift ++ tokenDrift ++ global)
      .toDF("source", "check", "pass", "observed", "expected")
  }

  /** Suggested narrowest-fitting column DDL per source, derived from the
    * observed stats — the reference's diagnose-then-fix loop closed
    * (README.md:86-104 diagnoses truncation risk; json-type->col-type,
    * mysql.clj:169-204, emits the column that WOULD fit). Driver-side
    * over the KB-sized stats rows.
    */
  def suggestDdl(stats: Array[Row],
                 dialect: graft.dbtypes.DbTypeTranslator = graft.dbtypes.MySqlTranslator)
      : Seq[(String, String, String, String)] = {
    import graft.types.{IntT, StrT}
    stats.flatMap { r =>
      val s = r.getAs[String]("source")
      def intObs(mnF: String, mxF: String): Option[graft.types.SchemaType] =
        for {
          mn <- Option(r.getAs[Integer](mnF)); mx <- Option(r.getAs[Integer](mxF))
        } yield IntT(BigInt(mn.toInt), BigInt(mx.toInt))
      val cols = Seq(
        "doc_id" -> (for {
          mn <- Option(r.getAs[Integer]("min_docid_len"))
          mx <- Option(r.getAs[Integer]("max_docid_len"))
        } yield StrT(mn.toLong, mx.toLong)),
        "n_tok" -> intObs("min_ntok", "max_ntok"),
        "tokens_element" -> intObs("min_token", "max_token"))
      cols.collect { case (colName, Some(obs)) =>
        (s, colName, graft.types.SchemaType.render(obs),
          dialect.schemaTypeToColType(obs))
      }
    }.toSeq.sortBy(t => (t._1, t._2))
  }

  /** (n duplicated keys, n extra rows) under the configured uniqueness
    * strategy — None when `cfg.exactUniqueness` is off.
    */
  private[graft] def dupStats(df: DataFrame, cfg: SuiteConfig): Option[(Long, Long)] =
    if (!cfg.exactUniqueness) None
    else {
      // count-only: the exchange ships TWO independent 64-bit hashes of
      // the key instead of the key string (the dropExactDuplicates
      // payload-free shape, guide §2.3 "shuffle keys' metadata"): 16
      // fixed bytes per row and long-pair hash-agg compares, with joint
      // collision odds ~2^-128 per pair — negligible at any physical
      // corpus size. NULL doc_ids: xxhash64 skips null children, so all
      // nulls share one constant hash pair — exactly how groupBy(doc_id)
      // groups them (SQL grouping treats NULLs equal), counting as one
      // duplicated key when 2+ rows; per-source null counts are the
      // n_null_docid check's job.
      val dups =
        if (cfg.uniquenessHashFirst) duplicateKeysHashFirst(df)
        else df.select(xxhash64(col("doc_id")).as("__h"),
            graft.ops.Dedup.contentHash2(col("doc_id")).as("__h2"))
          .groupBy(col("__h"), col("__h2"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      val r = dups.agg(count(lit(1)).as("k"),
        coalesce(sum(col("n") - 1), lit(0L)).as("extra")).collect()(0)
      Some((r.getLong(0), r.getLong(1)))
    }

  /** Attach the by-source suite-stats observation to `df`. After exactly
    * ONE action runs over the returned frame, the thunk yields the stats
    * rows (the [[sourceStats]] schema) — the fused one-scan machinery
    * shared by [[validateOneScan]], the resumable runner, and the
    * streaming micro-batch path.
    */
  private[graft] def observeStats(df: DataFrame, cfg: SuiteConfig)
      : (DataFrame, () => Array[Row]) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      SuiteStatsBySourceAgg.suite_stats_by_source(
        col("source"), col("doc_id"), col("tokens"), col("n_tok"), cfg)
        .as("stats"))
    val statsSchema = StructType(
      StructField("source", StringType, nullable = true) +:
        SuiteStatsAgg.schema.fields)
    val thunk = () => obs.get("stats")
      .asInstanceOf[scala.collection.Seq[Row]]
      .map { r =>
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          (r.get(0) +: r.getStruct(1).toSeq).toArray, statsSchema): Row
      }.toArray
    (observed, thunk)
  }

  /** One-shot (non-resumable) validation of an in-memory DataFrame. */
  def validate(spark: SparkSession, df: DataFrame, dim: DataFrame,
               cfg: SuiteConfig = SuiteConfig()): ValidationReport = {
    val stats = sourceStats(df, cfg).collect()
    val viols = violations(df, cfg)
    val dupAgg = dupStats(df, cfg)
    val verdicts = buildVerdicts(spark, stats, dim.collect(), dupAgg, cfg)
    ValidationReport(verdicts, viols, statsToDf(spark, stats))
  }

  /** ONE-SCAN validation: the per-source stats ride the violations scan as
    * an `observe` (CollectMetrics) aggregate ([[SuiteStatsBySourceAgg]]),
    * so the suite's two full-data passes collapse into one — at 100 TB the
    * table scan IS the cost, and this halves it. Uniqueness is a count-only
    * exchange over the pruned key column (~1% of table width); set
    * `cfg.uniquenessHashFirst` on network-bound clusters (see SuiteConfig).
    *
    * Because observed metrics only materialize when an ACTION runs over
    * the instrumented frame, this method runs the violations action
    * itself: `violationsOut = Some(path)` writes the violation rows as
    * parquet (the pipeline shape — the scan does double duty), `None`
    * counts them. The returned report's `violations` frame re-derives
    * violations lazily for further use.
    *
    * Semantics are pinned identical to [[validate]] by FusedValidateSpec
    * (same verdicts; same stats up to sketch-internal randomness).
    */
  def validateOneScan(spark: SparkSession, df: DataFrame, dim: DataFrame,
                      cfg: SuiteConfig = SuiteConfig(),
                      violationsOut: Option[String] = None): ValidationReport = {
    val (observed, statsThunk) = observeStats(df, cfg)
    val viols = violations(observed, cfg)
    violationsOut match {
      case Some(path) => viols.write.mode("overwrite").parquet(path)
      case None       => viols.count()
    }
    val stats = statsThunk()
    val verdicts = buildVerdicts(spark, stats, dim.collect(), dupStats(df, cfg), cfg)
    ValidationReport(verdicts, violations(df, cfg), statsToDf(spark, stats))
  }

  private[graft] def statsToDf(spark: SparkSession, rows: Array[Row]): DataFrame =
    if (rows.isEmpty) spark.emptyDataFrame
    else spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), rows(0).schema)
}
