package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence for the streaming-pipeline scale claim: per-batch cost must
  * stay ~flat as the KEPT corpus grows (each batch touches the prior
  * corpus only through index probes with batch-sized join sides). Splits
  * the input corpus into `batches` deterministic doc_id-mod slices and
  * runs [[graft.streaming.StreamingPipeline.processBatch]] on each,
  * printing per-batch seconds + the kept-corpus size it probed against.
  * A growing per-batch time here would mean some stage re-reads the
  * corpus proportionally — the regression this tool exists to catch.
  *
  * Usage: runMain graft.tools.StreamBench [inputDir] [batches] [maxIndexDeltas]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val input = if (args.nonEmpty) args(0) else "target/codegenbench-docs"
    val batches = if (args.length > 1) args(1).toInt else 5
    val maxDeltas = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val state = java.nio.file.Files.createTempDirectory("streambench").toString
    val docs = spark.read.parquet(input)
    val withSource =
      if (docs.columns.contains("source")) docs
      else docs.withColumn("source", lit("s"))
    val p = graft.streaming.StreamingPipeline.Params(maxIndexDeltas = maxDeltas)
    var keptSoFar = 0L
    for (b <- 0 until batches) {
      val slice = withSource.filter(pmod(col("doc_id"), lit(batches)) === b)
      val t0 = System.nanoTime()
      graft.streaming.StreamingPipeline.processBatch(spark, slice, b.toLong,
        state, p)
      val secs = (System.nanoTime() - t0) / 1e9
      val kept = spark.read.parquet(
        graft.streaming.StreamingPipeline.trainPath(state)).count()
      println(f"batch $b: ${secs}%6.2f s  (prior kept corpus: $keptSoFar; now: $kept)")
      keptSoFar = kept
    }
    spark.stop()
  }
}
