package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.internal.io.FileCommitProtocol
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.SQLExecution
import org.apache.spark.sql.execution.datasources.{FileFormatWriter, WriteJobStatsTracker}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Bridge to the `private[sql]` V1 write path so staged commit writes can
  * carry caller-supplied [[WriteJobStatsTracker]]s — per-file statistics are
  * then accumulated INSIDE the write tasks (Delta's stats-tracker shape)
  * instead of re-reading the staged files in a separate Spark job. The
  * invocation mirrors Spark's own `FileStreamSink.addBatch`, which drives
  * `FileFormatWriter.write` directly for exactly this reason. */
object StatsWriteBridge {

  /** The session's cast/render timezone (what `.cast("string")` on a
    * timestamp column uses). */
  def sessionZoneId(df: DataFrame): String =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.sessionLocalTimeZone

  /** Hadoop conf as DataFrameWriter would build it for `options` (session
    * overlays + per-write options such as parquet bloom-filter toggles). */
  def hadoopConfWithOptions(df: DataFrame,
      options: Map[String, String]): Configuration =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.newHadoopConfWithOptions(options)

  /** Write `df` as parquet under `path` through the same FileFormatWriter
    * machinery `df.write.parquet(path)` bottoms out in (same committer,
    * same partition-directory layout, same part-file naming, same
    * partition-column sort), additionally running `trackers` inside the
    * write tasks. `path` must be a fresh staging directory. */
  def writeParquet(df: DataFrame, path: String,
      partitionColumnNames: Seq[String],
      options: Map[String, String],
      trackers: Seq[WriteJobStatsTracker]): Unit = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val session = ds.sparkSession
    val qe = ds.queryExecution
    val resolver = session.sessionState.conf.resolver
    val partitionColumns: Seq[Attribute] = partitionColumnNames.map { name =>
      qe.analyzed.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"partition column $name not found in " +
            qe.analyzed.output.map(_.name).mkString(", ")))
    }
    val hadoopConf = session.sessionState.newHadoopConfWithOptions(options)
    val committer = FileCommitProtocol.instantiate(
      session.sessionState.conf.fileCommitProtocolClass,
      jobId = java.util.UUID.randomUUID().toString,
      outputPath = path)
    SQLExecution.withNewExecutionId(qe, Some("graft staged write")) {
      FileFormatWriter.write(
        sparkSession = session,
        plan = qe.executedPlan,
        fileFormat = new ParquetFileFormat(),
        committer = committer,
        outputSpec = FileFormatWriter.OutputSpec(path, Map.empty,
          qe.analyzed.output),
        hadoopConf = hadoopConf,
        partitionColumns = partitionColumns,
        bucketSpec = None,
        statsTrackers = trackers,
        options = options)
    }
    ()
  }
}
