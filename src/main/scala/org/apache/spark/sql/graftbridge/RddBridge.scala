package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Access to the checkpoint file behind a `Dataset.checkpoint()` result.
  * The checkpointed RDD is internal (the Dataset wraps it in a
  * LogicalRDD; `df.rdd` would build a NEW uncheckpointed RDD on top), and
  * LogicalRDD is private[sql] — hence this bridge. Used by the iterative
  * operators to delete SUPERSEDED per-round reliable checkpoints, which
  * the ContextCleaner never reclaims.
  */
object RddBridge {
  def checkpointFile(df: Dataset[_]): Option[String] =
    df.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.getCheckpointFile
      case _ => None
    }
}
