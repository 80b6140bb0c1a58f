package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion, so graft
  * can expose custom codegen'd Catalyst expressions as ordinary `Column`s.
  * Lives under `org.apache.spark.sql` only for access; contains no logic.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — what lets graft expose custom logical nodes
    * through the ordinary Dataset API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a Dataset. */
  def logicalPlan(df: Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Re-wrap a BATCH DataFrame as a STREAMING one (`isStreaming = true`),
    * the contract a V1 streaming `Source.getBatch` must meet: the engine
    * splices the returned plan in place of the source relation and
    * requires it to be flagged streaming. The batch plan (and its file
    * list) is frozen at call time — exactly what an exactly-once source
    * wants, since a checkpoint replay of the same offset range must read
    * the same files. This is the same internal hook Spark's own file
    * source uses (`internalCreateDataFrame(..., isStreaming = true)`). */
  def asStreamingDataFrame(df: Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse of [[asStreamingDataFrame]]: re-flag a streaming-tagged
    * plan as batch so a spec can execute a `Source.getBatch` result
    * directly (outside a running StreamingQuery, where the analyzer
    * rejects `isStreaming = true` plans). */
  def asBatchDataFrame(df: Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // Can't run `queryExecution.toRdd` here — the batch checker rejects a
    // streaming-flagged plan — so unwrap the LogicalRDD's row RDD directly.
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        cs.internalCreateDataFrame(
          lr.rdd.asInstanceOf[org.apache.spark.rdd.RDD[
            org.apache.spark.sql.catalyst.InternalRow]],
          df.schema, isStreaming = false)
      case other => sys.error(
        s"asBatchDataFrame expects a LogicalRDD streaming wrapper, got: $other")
    }
  }

  /** Whether the session's cache manager holds NO cached plan — the
    * specs' probe for "this call released every persist it took"
    * (`sharedState` is `private[sql]`, hence bridged). */
  def cacheManagerIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Drop the materialized blocks behind a `localCheckpoint(eager = true)`
    * Dataset. `spark.catalog.clearCache()` only covers `persist`ed plans, so
    * iterative algorithms that checkpoint per round would otherwise leak one
    * block set per round until the ContextCleaner happens to GC the RDD —
    * measured as multi-second slowdowns of *subsequent* queries in a long
    * benchmark session. Only call once nothing will read the Dataset again:
    * a localCheckpoint has no lineage to recompute from.
    */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drop the blocks AND (for a RELIABLE checkpoint) the checkpoint FILES
    * behind one RDD. Spark only auto-reclaims reliable-checkpoint files
    * under `spark.cleaner.referenceTracking.cleanCheckpoints=true`, so a
    * session planning many durable diffs would otherwise accumulate one
    * `rdd-N/` directory per diff in the checkpoint dir forever — this is
    * the deleting twin [[freeLocalCheckpoint]] never needed (local
    * checkpoints live in executor blocks, not files). Deletes the RDD's
    * OWN recorded checkpoint path (`getCheckpointFile`) — NOT
    * `ReliableRDDCheckpointData.cleanCheckpoint`, which recomputes the
    * path from the context's CURRENT checkpoint dir and silently misses
    * whenever that changed since the checkpoint was written (every
    * `withCheckpointDir` block, and every `setCheckpointDir` call, which
    * appends a fresh UUID subdir). Only call once nothing will read the
    * RDD again — a checkpoint has no lineage to recompute. */
  def freeRddCheckpoint(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    rdd.getCheckpointFile.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(rdd.sparkContext.hadoopConfiguration).delete(p, true)
    }
    rdd.unpersist(blocking = false)
  }

  /** [[freeLocalCheckpoint]]'s superset: frees blocks and, when the
    * Dataset was RELIABLY checkpointed (`Dataset.checkpoint`), deletes
    * its checkpoint files too. */
  def freeCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        freeRddCheckpoint(lr.rdd)
      case _ => ()
    }

  /** Run `body` with the context's checkpoint directory set to `dir`,
    * restoring the previous value after (`SparkContext.checkpointDir` is
    * `private[spark]` — there is no public unset, and a shared test
    * session must not leak the setting into unrelated suites). */
  def withCheckpointDir[T](
      spark: org.apache.spark.sql.SparkSession, dir: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.checkpointDir
    sc.setCheckpointDir(dir)
    try body finally sc.checkpointDir = prev
  }
}
