package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the DupSpans shapes over the OpsBench corpus —
  * a diagnostic main (test scope), not part of the driver contract.
  * Usage: Test/runMain graft.DupSpansProfile [copies]
  */
object DupSpansProfile {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{DupSpans, TextOps}

    val corpusPath = s"target/opsbench-docs-$copies"
    def docs = spark.read.parquet(corpusPath)

    def time(name: String)(f: => Any): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val out = f
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs out=$out")
      }
      spark.catalog.clearCache()
    }

    // raw derivation
    time("windows_derive")(docs.select(col("doc_id"),
      posexplode(TextOps.shingles(col("text"), 8))).count())

    // old round-2 shape: by-hash window count + islands
    time("old_window_shape") {
      val windows = docs.select(col("doc_id").as("id"),
        size(split(col("text"), " ")).as("n_words"),
        posexplode(TextOps.shingles(col("text"), 8)).as(Seq("pos", "h")))
      val byHash = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      val flagged = windows
        .withColumn("n", count(lit(1)).over(byHash))
        .filter(col("n") > 1)
        .select(col("id"), col("n_words"), col("pos"))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("pos"))
      flagged.withColumn("island", col("pos") - row_number().over(byDoc))
        .groupBy(col("id"), col("island"))
        .agg(min(col("pos")).as("s"), count(lit(1)).as("k"))
        .count()
    }

    // new shape, stage by stage
    time("new_full")(DupSpans.dupSpansH(docs, "text", "doc_id", 8).value.count())
    time("new_keepfirst")(
      DupSpans.dupSpansKeepFirstH(docs, "text", "doc_id", 8).value.count())

    // cut isolated: spans precomputed + persisted, only the cut timed
    val spans = DupSpans.dupSpansKeepFirst(docs, "text", "doc_id", 8)
      .persist()
    println(s"spans rows = ${spans.count()}")
    time("cut_native_only")(DupSpans.cutSpans(docs, "text", "doc_id", spans)
      .agg(sum(length(col("text_cut")))).collect()(0).getLong(0))
    val spans2 = DupSpans.dupSpansKeepFirst(docs, "text", "doc_id", 8)
      .persist()
    spans2.count()
    time("cut_hof_only")(DupSpans.cutSpansComposed(docs, "text", "doc_id", spans2)
      .agg(sum(length(col("text_cut")))).collect()(0).getLong(0))

    // span-DENSE cut: 20 synthetic 2-word spans per doc — the HOF twin
    // pays words x spans interpreted lambdas per row, the native walk is
    // O(words + spans log spans)
    def denseSpans() = docs
      .crossJoin(spark.range(0, 20).select(col("id").as("i")))
      .select(col("doc_id").as("id"), (col("i") * 3).as("span_start"),
        lit(2L).as("span_words"))
      .persist()
    val d1 = denseSpans(); d1.count()
    time("dense_cut_native")(DupSpans.cutSpans(docs, "text", "doc_id", d1)
      .agg(sum(length(col("text_cut")))).collect()(0).getLong(0))
    val d2 = denseSpans(); d2.count()
    time("dense_cut_hof")(DupSpans.cutSpansComposed(docs, "text", "doc_id", d2)
      .agg(sum(length(col("text_cut")))).collect()(0).getLong(0))
    spark.stop()
  }
}
