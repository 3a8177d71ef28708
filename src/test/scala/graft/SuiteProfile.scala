package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.constraints.Validator
import graft.sequences.SequenceSynth

/** Phase-level timing of the validation suite (tool, not a test):
  * `sbt "Test/runMain graft.SuiteProfile <rows> <cpus>"`.
  */
object SuiteProfile {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(6000000L)
    val cpus = args.lift(1).getOrElse("16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val input = s"target/bench-scale-${if (rows == 24000000L) "24m" else rows.toString}"
    val fs = new org.apache.hadoop.fs.Path(input)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(fs.makeQualified(new org.apache.hadoop.fs.Path(input)))) {
      SequenceSynth.write(spark, SequenceSynth.Config(rows = rows), input, cpus.toInt)
    }
    val cfg = Validator.SuiteConfig()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    (1 to 3).foreach { i =>
      println(s"--- iteration $i ---")
      val df = spark.read.parquet(input)
      time("stats (scan+agg)") { Validator.sourceStats(df, cfg).collect() }
      time("violations (scan)") { Validator.violations(df, cfg).count() }
      time("uniqueness (shuffle)") {
        Validator.duplicateKeys(df).agg(count(lit(1))).collect()
      }
      time("scan only (baseline)") {
        df.select(sum(element_at(col("tokens"), 1))).collect()
      }
    }
    spark.stop()
  }
}
