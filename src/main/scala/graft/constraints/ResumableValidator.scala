package graft.constraints

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lineage.Checkpoint
import Validator.{SuiteConfig, ValidationReport}

/** Checkpointed, restartable validation over a source-partitioned
  * sequences table. A rerun after a crash revalidates only partitions
  * whose input lineage (file list) changed; unchanged partitions' stats,
  * violations, and verdict inputs are served from state — the scan skip is
  * real partition pruning on the `source=` filter.
  */
object ResumableValidator {

  final case class RunSummary(
      report: ValidationReport,
      validatedSources: Seq[String],
      skippedSources: Seq[String],
      totalRows: Long)

  def run(spark: SparkSession, inputPath: String, dim: DataFrame,
          cfg: SuiteConfig, statePath: String): RunSummary = {

    val (done, todo) = Checkpoint.plan(spark, inputPath, statePath)
    val allSources = (done ++ todo).map(_.source)
    require(allSources.nonEmpty,
      s"$inputPath has no source= partitions; use Validator.validate for unpartitioned input")
    val input = spark.read.parquet(inputPath)

    if (todo.nonEmpty) {
      val todoSources = todo.map(_.source)
      // partition-pruned scan: only not-yet-validated sources are read
      val fresh = input.filter(col("source").isin(todoSources: _*))

      Validator.violations(fresh, cfg)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("source")
        .parquet(Checkpoint.violationsPath(statePath))

      Validator.sourceStats(fresh, cfg)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("source")
        .parquet(Checkpoint.statsPath(statePath))

      // manifests LAST: a crash between data and manifest writes only
      // means redundant (idempotent) revalidation on the next run
      val freshRowCounts = spark.read.parquet(Checkpoint.statsPath(statePath))
        .filter(col("source").isin(todoSources: _*))
        .select(col("source"), col("n_rows")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      todo.foreach { pl =>
        Checkpoint.writeManifest(spark, statePath, pl,
          freshRowCounts.getOrElse(pl.source, 0L))
      }
    }

    // assemble from state for ALL current sources
    val stats = spark.read.parquet(Checkpoint.statsPath(statePath))
      .filter(col("source").isin(allSources: _*))
      .collect()
    // an all-clean run writes no violation files; fall back to an empty
    // frame with the canonical schema
    val viols =
      try spark.read.parquet(Checkpoint.violationsPath(statePath))
        .filter(col("source").isin(allSources: _*))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        Validator.violations(input.limit(0), cfg)
      }

    // global uniqueness always reruns: it is cross-partition by nature and
    // scans a two-column projection of the full table
    val dupAgg =
      if (cfg.exactUniqueness) {
        val r = Validator.duplicateKeys(input)
          .agg(count(lit(1)).as("k"),
            coalesce(sum(col("n") - 1), lit(0L)).as("extra")).collect()(0)
        Some((r.getLong(0), r.getLong(1)))
      } else None

    val verdicts = Validator.buildVerdicts(spark, stats, dim.collect(), dupAgg, cfg)
    verdicts.coalesce(1).write.mode("overwrite")
      .parquet(Checkpoint.verdictsPath(statePath))

    val totalRows = stats.map(_.getAs[Long]("n_rows")).sum
    RunSummary(
      ValidationReport(verdicts, viols, Validator.statsToDf(spark, stats)),
      validatedSources = todo.map(_.source),
      skippedSources = done.map(_.source),
      totalRows = totalRows)
  }
}
