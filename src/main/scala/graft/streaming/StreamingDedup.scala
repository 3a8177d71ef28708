package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.IncrementalDedup

/** Continuous near-duplicate mining over a GROWING documents directory —
  * the streaming deployment of [[graft.ops.IncrementalDedup]]: each
  * micro-batch PROBES the persisted signature index for
  * (new x all-prior) + (new x new) candidate pairs, writes them, and then
  * appends its own signatures so later batches see it. Old x old work is
  * never repeated — per-batch cost is proportional to the batch, not the
  * corpus.
  *
  * Exactly-once across restarts, without a watermark file:
  *  - candidates are written partitioned by batch_id with dynamic
  *    overwrite — a replayed batch overwrites its own pairs;
  *  - the index is partitioned by (band, batch_id) and written with
  *    dynamic overwrite too, so a replayed append is idempotent;
  *  - a replay that probes an index already containing its own batch
  *    (crash between the two writes) only re-derives pairs the in-batch
  *    join produces anyway — the (id_a, id_b) groupBy collapses them and
  *    the id inequality drops self-pairs, so the output is unchanged.
  */
object StreamingDedup {

  def indexPath(statePath: String) = s"$statePath/sig-index"
  def candidatesPath(statePath: String) = s"$statePath/candidates"
  def checkpointPath(statePath: String) = s"$statePath/checkpoint"

  final case class Params(shingleK: Int = 3, perms: Int = 32,
                          bands: Int = 16, minJaccard: Double = 0.5)

  private[streaming] def processBatch(spark: SparkSession, batch: DataFrame,
                                      batchId: Long, statePath: String,
                                      p: Params): Unit = {
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val haveIndex = fs.exists(fs.makeQualified(
      new org.apache.hadoop.fs.Path(indexPath(statePath))))

    val cands =
      if (haveIndex)
        IncrementalDedup.newDocCandidates(spark, batch, "text", "doc_id",
          indexPath(statePath), p.shingleK, p.perms, p.bands, p.minJaccard)
      else // first batch: only new x new exists
        graft.ops.Dedup.minhashCandidates(batch, "text", "doc_id",
          p.shingleK, p.perms, p.bands, p.minJaccard, materialize = false)
    cands
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(candidatesPath(statePath))

    // append AFTER probing (a batch must not meet itself via the index);
    // (band, batch_id) partitioning makes the replayed append idempotent
    IncrementalDedup.signatureRows(batch, "text", "doc_id",
        p.shingleK, p.perms, p.bands)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("band", "batch_id")
      .parquet(indexPath(statePath))
  }

  /** Start the stream over a flat directory of parquet document files.
    * AvailableNow by default (the scheduled incremental-batch deployment).
    */
  def start(spark: SparkSession, inputDir: String, statePath: String,
            params: Params = Params(),
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointPath(statePath))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, statePath, params)
      }
      .start()
  }
}
