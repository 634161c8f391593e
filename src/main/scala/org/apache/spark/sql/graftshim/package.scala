package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is the
  * supported internal accessor — same approach Delta/Iceberg use). */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** FULL catalyst conversion of a Column's node tree: `toExpression`
    * yields a lazy `ColumnNodeExpression` wrapper (fine as a plan child,
    * opaque to pattern matching); this walks the ColumnNode tree into
    * real catalyst nodes (GreaterThan, In, And, ...) so plan-side code —
    * the manifest-stats pruner — can interpret the predicate shape. */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Streaming-tagged DataFrame from an InternalRow RDD — what a V1
    * streaming `Source.getBatch` must return (the batch is planned
    * inside a streaming query, so its leaves must be marked streaming;
    * Delta's DeltaSource uses the same internal constructor). */
  def internalCreateDataFrame(ctx: SQLContext,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    ctx.asInstanceOf[classic.SQLContext]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** DataFrame over an already-analyzed logical plan — what a DML
    * command captured at analysis time executes at run time (Delta's
    * command pattern; re-analysis of an analyzed plan is idempotent). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-plan a streaming micro-batch Dataset as a BATCH DataFrame (what
    * `Sink.addBatch` receives cannot be fed to batch operators
    * directly) — ForeachBatchSink's own trick: wrap the planned
    * InternalRow RDD in a non-streaming LogicalRDD. */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val node = execution.LogicalRDD.fromDataset(
      ds.queryExecution.toRdd, ds, isStreaming = false)
    classic.Dataset.ofRows(ds.sparkSession, node)
  }
}
