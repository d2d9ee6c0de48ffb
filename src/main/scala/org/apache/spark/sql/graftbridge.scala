package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for Spark 4.x, where the converters in
  * [[org.apache.spark.sql.classic.ExpressionUtils]] are `private[sql]`.
  * Library extension code (custom Catalyst expressions exposed as Columns)
  * needs exactly these two hops; this object re-exports them from inside the
  * `sql` package, the standard pattern for Spark extension libraries.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a SQL function on an already-running session (the extensions
    * mechanism only applies at session build time).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** DataFrame from an RDD of InternalRows without the external-Row
    * round-trip ([[classic.SparkSession.internalCreateDataFrame]] is
    * `private[sql]`): Ranker's dense-id assignment hands back UnsafeRows
    * directly instead of materializing every field (notably multi-KB text
    * payloads) as Java objects and re-encoding them row by row.
    */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** What an extensions injector would install at session build — the
    * builder is `private[sql]`, and tests assert the spark-submit wiring
    * without constructing a second SparkSession.
    */
  def injectedOptimizerRules(ext: SparkSessionExtensions, spark: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
