package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** The one Spark-internal hop a DataSource-V1 streaming `Source`
  * needs: `Source.getBatch` must hand MicroBatchExecution a DataFrame
  * whose logical plan is flagged `isStreaming = true` (the engine
  * asserts it), and the only constructor for that is the classic
  * session's `private[sql] internalCreateDataFrame`. This shim lives
  * in an `org.apache.spark.sql` subpackage solely to cross that
  * visibility fence — the standard pattern of every out-of-tree
  * connector with a V1 streaming source (Delta's `DeltaSource` sits
  * inside `org.apache.spark.sql.delta` for the same reason). Nothing
  * else internal is touched: the plan wrapped is an ordinary batch
  * plan built with the public DataFrame API.
  */
object GraftStreamingShim {

  /** Re-wrap `df`'s physical result as a streaming-flagged DataFrame
    * with the same schema — what `getBatch` is contractually required
    * to return. The batch plan still executes lazily (the RDD is the
    * plan's own `toRdd`); only the logical wrapper changes. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The write-side twin: `Sink.addBatch` receives a DataFrame bound
    * to the engine's IncrementalExecution, which a plain `df.write`
    * cannot re-plan. Re-wrap its physical result as an ordinary BATCH
    * frame (the same `internalCreateDataFrame` hop Delta's `DeltaSink`
    * takes) so the lake's commit path — one parquet write action over
    * the batch's rows — runs against a plan the batch planner owns. */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}

/** Public bridge over the `private[spark]`
  * [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]]
  * trait — the analyzer hook that lets `spark.readStream.table(…)`
  * on a V2 table WITHOUT micro-batch capability fall back to a V1
  * streaming source (the route Delta's `DeltaTableV2` takes).
  * [[graft.sql.GraftTable]] mixes this in to expose the
  * `graft-changes` source in rows mode; the trait body adds nothing —
  * the bridge exists only to cross the visibility fence, same as
  * [[GraftStreamingShim]].
  */
trait GraftV1StreamingFallback
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
