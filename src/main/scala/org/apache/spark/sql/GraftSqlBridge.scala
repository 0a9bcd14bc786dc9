package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4.x moved
  * Column onto ColumnNode; `classic.ExpressionUtils` is the supported
  * internal shim). Lives in the `org.apache.spark.sql` package purely for
  * access; contains no logic.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Lineage-truncating cheap checkpoint: re-roots `df` as a LogicalRDD over
    * its own execution RDD WITHOUT running a job. When the plan reads only
    * cached/persisted parents this gives localCheckpoint's flat-plan benefit
    * (no quadratic analyzer cost on delta unions) at zero job cost.
    */
  def rerootOnRdd(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }
}
