package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the recipe-operator family (round 6): the SCALE.md
  * shape claims ("sources-sized", "catalog-sized windows", "no global
  * sort") deserve a measured point beyond the graded scale. Runs
  * mix / epoch / order / calibration / chunking — plus the round-6
  * model-shaped family (BPE train/apply, LM train/score, CT-langid
  * train/classify, URL canonicalize+domain stats) — at two corpus sizes
  * (default 200k and 2M docs — 10x) and prints per-op wall time and
  * docs/sec so per-row cost flatness is a read-off. Apply/score/classify
  * rows use models trained ONCE on the 5k-doc base so they measure only
  * the native-expression scan; the train rows soak the training jobs
  * themselves. A diagnostic, not part of the driver contract.
  *
  * Usage: runMain graft.tools.RecipeScale [copiesSmall] [copiesBig] [runs]
  */
object RecipeScale {
  def main(args: Array[String]): Unit = {
    val copiesSmall = if (args.nonEmpty) args(0).toInt else 40
    val copiesBig = if (args.length > 1) args(1).toInt else 400
    val runs = if (args.length > 2) args(2).toInt else 2
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

    def corpus(copies: Int): String = {
      val path = s"target/recipescale-docs-$copies"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(fs.makeQualified(
          new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")))) {
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .crossJoin(spark.range(0, copies).select(col("id").as("copy")))
          .select(
            (col("doc_id") * copies + col("copy")).as("doc_id"),
            concat(col("text"), lit(" salt"), col("copy").cast("string"))
              .as("text"),
            col("source"))
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(path)
      }
      path
    }

    // fixed models for the apply-side rows (trained on the 5k-doc base,
    // constant across corpus sizes — the scan is the thing under test)
    val baseDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val bpeModel = graft.ops.Bpe.train(baseDocs, "text", numMerges = 200)
    val lmModel = graft.ops.NgramLm.train(baseDocs, "text")
    val ctProfiles = graft.ops.CtLangId.trainProfiles(baseDocs, "text", "source")

    for (copies <- Seq(copiesSmall, copiesBig)) {
      val path = corpus(copies)
      val n = copies * 5000L
      def docs = spark.read.parquet(path)
      def bestOf(name: String)(f: => Long): Unit = {
        val ts = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val out = f
          ((System.nanoTime() - t0) / 1e9, out)
        }
        val best = ts.map(_._1).min
        println(f"[$n%9d docs] $name%-14s best=${best}%7.2fs  docs/s=${n / best}%10.0f  out=${ts.last._2}")
        spark.catalog.clearCache()
      }

      bestOf("mix")(graft.ops.SourceMix
        .temperatureSample(docs, "doc_id", "source", n / 10).count())
      bestOf("epoch") {
        val d = docs.withColumn("tok", length(col("text")).cast("long"))
        graft.ops.EpochPlan.epochSample(d, "doc_id", "source", "tok",
          budgetTokens = n * 300L).count() // ~2 epochs of ~150-char docs
      }
      bestOf("order")(graft.ops.TrainOrder.trainOrder(docs, "doc_id")
        .agg(max(col("ord"))).head().getLong(0))
      bestOf("calibration") {
        val d = docs.withColumn("len", length(col("text")).cast("long"))
        graft.ops.Calibration.thresholdReport(d, "source", "len", 0.1).count()
      }
      bestOf("chunking")(graft.ops.Chunking
        .chunk(docs, "text", "doc_id", 32, 24).count())

      // round-6 model-shaped family
      bestOf("bpe_train")(
        graft.ops.Bpe.train(docs, "text", numMerges = 50).merges.size.toLong)
      bestOf("bpe_apply")(docs
        .agg(sum(size(graft.ops.Bpe.encode(col("text"), bpeModel))))
        .head().getLong(0))
      bestOf("lm_train")(graft.ops.NgramLm.train(docs, "text").vocabSize)
      bestOf("lm_score")(docs
        .agg(sum(graft.ops.NgramLm.stats(col("text"), lmModel)
          .getField("n_tok"))).head().getLong(0))
      bestOf("ct_train")(
        graft.ops.CtLangId.trainProfiles(docs, "text", "source").size.toLong)
      bestOf("ct_classify")(docs.filter(graft.ops.CtLangId.classify(
        graft.ops.CtLangId.profile(col("text")), ctProfiles) =!= "und").count())
      bestOf("url_canon") {
        val withUrl = docs.select(concat(lit("HTTP://WWW."), col("source"),
          lit(".Example.COM:80/p/"), col("doc_id").cast("string"),
          lit("?utm_source=x&q=1")).as("url"))
        graft.ops.UrlOps.domainStats(withUrl, "url").count()
      }
    }
    spark.stop()
  }
}
