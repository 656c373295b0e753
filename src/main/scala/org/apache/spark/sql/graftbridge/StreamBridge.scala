package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to `private[sql] SparkSession.internalCreateDataFrame`: a V1
  * streaming `Source.getBatch` must return a DataFrame whose logical plan
  * carries `isStreaming = true` (MicroBatchExecution asserts it), and the
  * only way to stamp that flag is the internal constructor — the same call
  * `MemoryStream` and the file stream source use. The wrapped RDD is the
  * batch plan's own lazy execution, so no extra materialization happens. */
object StreamBridge {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch`: re-wrap the micro-batch's
    * incremental plan as a BATCH DataFrame so it can go through a normal
    * `.write` (the micro-batch DataFrame itself refuses batch actions). */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
