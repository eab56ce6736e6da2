package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  * Spark 4 hides the classic converters behind `private[sql]`; exposing
  * them from inside the package is the standard extension-library trick
  * (the public alternative — registering every expression in the
  * session FunctionRegistry — needs a live session at call-graph build
  * time, which session-agnostic operator code doesn't have).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Stable unique id of a session (Spark keeps it `private[sql]` on the
    * API class; the classic implementation's accessor is public).
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** Serializable Hadoop conf wrapper (`private[spark]` upstream) — a
    * DSv2 reader factory must ship the driver's conf to executors or
    * non-local filesystems (s3a, hdfs) lose their credentials/settings.
    */
  def serializableConf(
      conf: org.apache.hadoop.conf.Configuration): Serializable =
    new org.apache.spark.util.SerializableConfiguration(conf)

  def confOf(wrapped: Serializable): org.apache.hadoop.conf.Configuration =
    wrapped.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value

  /** Release the executor-storage blocks behind a `localCheckpoint()`ed
    * Dataset. Spark exposes no public unpersist for checkpoint blocks
    * (they normally live until the ContextCleaner GCs the RDD handle),
    * which lets iterative peels/fixpoints accumulate a round's worth of
    * storage per iteration; the checkpointed plan is a bare
    * `LogicalRDD`, so unpersisting its RDD frees the blocks
    * deterministically. Only call once every downstream consumer of the
    * checkpoint has itself materialized.
    */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
}
