package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the recipe-operator family (round 6): the SCALE.md
  * shape claims ("sources-sized", "catalog-sized windows", "no global
  * sort") deserve a measured point beyond the graded scale. Runs
  * mix / epoch / order / calibration / chunking at two corpus sizes
  * (default 200k and 2M docs — 10x) and prints per-op wall time and
  * docs/sec so per-row cost flatness is a read-off. A diagnostic, not
  * part of the driver contract.
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
    }
    spark.stop()
  }
}
