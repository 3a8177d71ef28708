package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput measurement for the round-2 pipeline operators over a
  * deterministically derived larger corpus: the sf0.1 documents table
  * (5k docs) replicated `copies` times with a per-copy salt word appended,
  * plus an unsalted twin every `dupEvery`-th doc so near-dup structure
  * exists at scale. Prints one timing line per op. A diagnostic, not part
  * of the driver contract.
  *
  * Usage: runMain graft.tools.OpsBench [copies] [runs]
  */
object OpsBench {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 40
    val runs = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val corpusPath = s"target/opsbench-docs-$copies"
    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(fs.makeQualified(new org.apache.hadoop.fs.Path(s"$corpusPath/_SUCCESS")))) {
      base.crossJoin(spark.range(0, copies).select(col("id").as("copy")))
        .select(
          (col("doc_id") * copies + col("copy")).as("doc_id"),
          // salt most copies (unique text); every 7th copy keeps the
          // original text -> planted exact/near duplicate structure
          when(pmod(col("copy"), lit(7)) === 0, col("text"))
            .otherwise(concat(col("text"), lit(" salt"),
              col("copy").cast("string"))).as("text"),
          col("source"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val nDocs = copies * 5000L

    def bestOf(name: String)(f: => Long): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val out = f
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val best = ts.map(_._1).min
      println(f"$name%-26s best=${best}%7.2fs  docs/s=${nDocs / best}%9.0f  out=${ts.last._2}")
      spark.catalog.clearCache()
    }
    def docs = spark.read.parquet(corpusPath)

    bestOf("quality_filter")(
      graft.ops.QualityFilter.annotate(docs, "text")
        .filter(!col("keep")).count())
    bestOf("redaction")(
      graft.ops.Redaction.annotate(docs, "text")
        .agg(sum(col("n_email") + col("n_phone"))).collect()(0).getLong(0))
    bestOf("exact_dedup")(
      graft.ops.Dedup.dropExactDuplicates(docs, "text", "doc_id").count())
    bestOf("dup_spans")(
      graft.ops.DupSpans.dupSpans(docs, "text", "doc_id").count())
    bestOf("dup_spans_keepfirst")(
      graft.ops.DupSpans.dupSpansKeepFirst(docs, "text", "doc_id").count())
    // span CUTTING in isolation: spans precomputed + persisted OUTSIDE
    // the timer, so these two rows measure only the cut projection —
    // native one-walk expression vs the composed per-word x per-span HOF
    // twin (same spans, same output checksum)
    locally {
      val spans = graft.ops.DupSpans.dupSpansKeepFirst(docs, "text", "doc_id")
        .persist()
      spans.count()
      def cutSum(cut: (org.apache.spark.sql.DataFrame, String, String,
          org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Long =
        cut(docs, "text", "doc_id", spans)
          .agg(sum(length(col("text_cut")))).collect()(0).getLong(0)
      def timeOnly(name: String)(f: => Long): Unit = {
        val ts = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val out = f
          ((System.nanoTime() - t0) / 1e9, out)
        }
        val best = ts.map(_._1).min
        println(f"$name%-26s best=${best}%7.2fs  docs/s=${nDocs / best}%9.0f  out=${ts.last._2}")
      }
      timeOnly("cut_only_native")(cutSum(graft.ops.DupSpans.cutSpans))
      timeOnly("cut_only_hof")(cutSum(graft.ops.DupSpans.cutSpansComposed))
      spans.unpersist()
      spark.catalog.clearCache()
    }
    bestOf("minhash_pairs") {
      val n = graft.ops.Dedup.minhashCandidates(docs, "text", "doc_id",
        bands = 16, minJaccard = 0.8).count()
      n
    }
    bestOf("packing")(
      graft.ops.Packing.packGreedy(
        docs.withColumn("len", length(col("text"))),
        "source", "doc_id", "len", 4096).count())
    bestOf("decontamination") {
      // uncapped: the synthetic corpus's tiny vocabulary makes EVERY
      // 3-gram boilerplate at this scale (df 100-750), so any realistic
      // maxShingleDf would drop all shingles — this measures the exact
      // (worst-case) inverted-index join
      graft.ops.Decontamination.containmentPairs(
        docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        "text", "doc_id", minContainment = 0.9).count()
    }
    spark.stop()
  }
}
