package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the session values of perf-relevant SQL confs under the Bench
  * session shape (diagnostic).
  */
object ConfCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val keys = Seq(
      "spark.sql.parquet.enableNestedColumnVectorizedReader",
      "spark.sql.parquet.enableVectorizedReader",
      "spark.sql.parquet.compression.codec",
      "spark.sql.codegen.hugeMethodLimit",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.join.preferSortMergeJoin",
      "spark.sql.execution.sortBeforeRepartition",
      "spark.io.compression.codec",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.windowGroupLimitThreshold")
    keys.foreach { k =>
      val v = try spark.conf.get(k) catch { case _: Throwable => "<unset>" }
      println(s"$k = $v")
    }
    spark.stop()
  }
}
