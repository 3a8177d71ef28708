package graft

import org.apache.spark.sql.SparkSession

/** Time + explain one battery query at a given SF dir — a diagnostic
  * main (test scope). Usage: Test/runMain graft.QueryProfile q21_embed_neardup /root/testdata/sf0.1 [runs] [explain]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val doExplain = args.length > 3
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
    val d = Queries.defs.toMap.apply(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = d.fn(spark, dir).count()
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      spark.catalog.clearCache()
    }
    if (doExplain) {
      val df = d.fn(spark, dir)
      df.count()
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
