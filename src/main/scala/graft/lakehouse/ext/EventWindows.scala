package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Time-windowed event aggregation: tumbling/sliding/session windows, in
  * both batch form (oracle-comparable) and Structured Streaming form
  * (watermarked; exercised in tests with file/memory sources).
  *
  * The batch and streaming variants share the same aggregation expressions,
  * so a pipeline validated in batch against the DuckDB oracle carries the
  * same semantics into the stream.
  */
object EventWindows {

  /** Tumbling window aggregation: (window_start, window_end, event_type,
    * n_events, total_value). Aggregation is a single hash-partitioned
    * shuffle on (window, event_type); value summed exactly in DECIMAL then
    * surfaced as DOUBLE (engine-portable, see Queries). */
  def tumbling(events: DataFrame, tsCol: String, width: String): DataFrame =
    events
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count("*").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding window aggregation (width, slide). Each event lands in
    * width/slide windows. */
  def sliding(events: DataFrame, tsCol: String, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col(tsCol), width, slide), col("event_type"))
      .agg(count("*").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Batch sessionization: a session breaks after `gapSeconds` of user
    * inactivity. Classic lag + running-sum session ids — two window passes
    * over the same (user_id, ts) partitioning, so Spark plans ONE shuffle
    * and reuses the sort. Output one row per session. */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col("event_id").asc)
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new_session")).over(byUser))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count("*").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
  }

  /** Streaming tumbling-window aggregation with a watermark; append mode.
    * Same agg expressions as [[tumbling]]. */
  def streamingTumbling(events: DataFrame, tsCol: String, width: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count("*").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Stream-ingest into a versioned lakehouse table: each micro-batch
    * snapshots the full accumulated state (or just the batch, when
    * `accumulate = false`) through [[graft.lakehouse.TableIO.writeTable]]'s
    * atomic commit protocol — readers of the table always see a complete,
    * consistent snapshot, never a partially-written micro-batch. Returns
    * the started query; callers own its lifecycle.
    *
    * This is the "bronze table" ingest shape: Structured Streaming handles
    * watermarks/exactly-once source offsets, the Versioned pointer swap
    * makes each batch's publish atomic. */
  def streamIngest(events: DataFrame, spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      accumulate: Boolean = false,
      checkpoint: Option[String] = None) = {
    var acc: Option[DataFrame] = None
    val w = events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val df = batch.toDF()
        val snapshot =
          if (!accumulate) df
          else {
            val merged = acc.map(_.unionByName(df)).getOrElse(df)
              .localCheckpoint(true) // cut lineage growth across batches
            acc = Some(merged)
            merged
          }
        graft.lakehouse.TableIO.writeTable(spark, lh, tableName, snapshot)
        ()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Streaming NEAR-DUP-deduplicated ingest — the bronze→silver pipeline in
    * one operator: each micro-batch is (1) near-dup-deduped against the
    * published corpus via its MinHash band index (the history's TEXT is
    * never re-hashed mid-stream — [[Dedup.nearDupsAgainstIndex]]), (2)
    * deduped within itself ([[Dedup.minHashNearDupPairs]]), and (3) the
    * surviving rows join the corpus, which is published atomically through
    * the versioned table protocol.
    *
    * Durability: the corpus is always re-read from the PUBLISHED table (the
    * durable parquet snapshot), never held as an in-memory lineage chain —
    * an executor loss cannot destroy it, and on restart the first batch
    * bootstraps the band index by re-hashing the published table once
    * (bounded, one-time) instead of silently starting empty and
    * overwriting history. Each batch publishes a full snapshot (the
    * protocol is snapshot-based); for very high-rate streams, batch
    * publication cost grows with the corpus — compact retention handles
    * the version churn. Returns the started query; schema must be
    * (idCol, textCol, …). */
  def streamIngestDeduped(docs: DataFrame, spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      idCol: String, textCol: String, threshold: Double = 0.8,
      checkpoint: Option[String] = None) = {
    import graft.lakehouse.TableIO
    var index: Option[DataFrame] = None
    var bootstrapped = false
    def publishedCorpus(): Option[DataFrame] =
      scala.util.Try(TableIO.selectTable(spark, lh, tableName)).toOption
        .filter(_ => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
          graft.lakehouse.Catalog.tablePath(lh, tableName))))
    val w = docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val df = batch.toDF()
        if (!bootstrapped) { // restart path: rebuild the index from disk once
          index = publishedCorpus().map(c =>
            Dedup.minHashBandIndex(c, idCol, textCol).localCheckpoint(true))
          bootstrapped = true
        }
        val corpus = publishedCorpus()
        val vsCorpus = (corpus, index) match {
          case (Some(c), Some(ix)) =>
            val dups = Dedup.nearDupsAgainstIndex(df, c, ix, idCol, textCol,
              threshold = threshold)
            df.join(dups.select(col("a").as(idCol)).distinct(),
              Seq(idCol), "left_anti")
          case _ => df
        }
        val withinPairs = Dedup.minHashNearDupPairs(vsCorpus, idCol, textCol,
          threshold = threshold)
        val survivors = Dedup.dedupByPairs(vsCorpus, idCol, withinPairs)
          .localCheckpoint(true)
        if (survivors.count() > 0) {
          val newCorpus = corpus.map(_.unionByName(survivors))
            .getOrElse(survivors)
          TableIO.writeTable(spark, lh, tableName, newCorpus)
          val newBands = Dedup.minHashBandIndex(survivors, idCol, textCol)
          index = Some(index.map(_.unionByName(newBands)).getOrElse(newBands)
            .localCheckpoint(true))
        }
        ()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Streaming exact deduplication: drop rows whose `keyCols` were already
    * seen within the watermark horizon (state is evicted past it, so the
    * dedup state stays bounded on an unbounded stream — the streaming twin
    * of Dedup.exactDedup for ingest pipelines that must not re-emit
    * re-delivered events/documents). */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming sessionization via the built-in session_window (gap-based,
    * watermarked state cleanup — Spark manages per-user session state). */
  def streamingSessions(events: DataFrame, userCol: String, tsCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count("*").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
}
