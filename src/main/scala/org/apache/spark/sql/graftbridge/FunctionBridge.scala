package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Post-hoc SQL function registration. `SparkSession.sessionState` is
  * private[sql] in Spark 4, so this shim (like [[ColumnBridge]]) lives in
  * the org.apache.spark.sql package; the supported public path for
  * cluster jobs is `spark.sql.extensions=graft.GraftExtensions`.
  */
object FunctionBridge {
  def register(spark: SparkSession, ident: FunctionIdentifier,
               info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
