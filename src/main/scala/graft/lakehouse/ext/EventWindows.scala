package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Ordered funnel analysis: for each user, the furthest step of `steps`
    * completed IN ORDER — step k counts only if an event of its type
    * occurs STRICTLY after the user's earliest completion of step k-1
    * (the standard product-analytics funnel; re-orderings don't count).
    * Returns one row per user who completed at least step 1:
    * (userCol, furthest_step 1-based int).
    *
    * Plan shape: one filtered partial aggregation per step — each scans
    * only that step's events (the type filter pushes into the scan) and
    * shuffles one row per qualifying user — then K-1 left joins of tiny
    * per-user frames. No window over raw events, no per-user event-list
    * materialization; at 100 TB each step's agg is a single map-side-
    * combined exchange over that step's slice. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepFrames = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (st, i)) =>
        val k = i + 1
        val filtered = events.filter(col(typeCol) === st)
        val f = acc match {
          case Nil =>
            filtered.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t1"))
          case prev :: _ =>
            filtered
              .join(prev.select(col(userCol), col(s"__t${k - 1}")),
                Seq(userCol))
              .filter(col(tsCol) > col(s"__t${k - 1}"))
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"__t$k"))
        }
        f :: acc
    }.reverse
    val joined = stepFrames.tail.foldLeft(stepFrames.head)(
      (a, b) => a.join(b, Seq(userCol), "left_outer"))
    val furthest = (2 to steps.size).foldLeft(lit(1)) {
      (rest, k) => when(col(s"__t$k").isNotNull, lit(k)).otherwise(rest)
    }
    joined.select(col(userCol), furthest.as("furthest_step"))
  }

  /** Streaming funnel: the incremental twin of [[funnel]], keeping per-user
    * state across micro-batches with `flatMapGroupsWithState`. State per
    * user = the earliest `maxPerStep` event times per funnel step (sorted);
    * the chained earliest-completion recursion (t_k = min step-k time
    * STRICTLY after t_{k-1}) is re-derived from those times on every
    * update, so late and out-of-order events — including an earlier
    * step-1 event arriving AFTER a step-2 event — are handled exactly as
    * the batch operator would, as long as no more than `maxPerStep`
    * step-k events precede the final t_{k-1} (a documented state bound:
    * per user the state is O(steps × maxPerStep) longs, never O(events)).
    * Emits (user, furthest_step) in Update mode; furthest_step is monotone
    * non-decreasing per user, so readers may max-merge emissions.
    * `userCol` must be long-typed (the fixture convention). */
  /** Last-touch attribution: each conversion event is credited to the
    * user's most recent NON-conversion event strictly earlier in the
    * (ts, id) order — first conversions with no prior touch attribute to
    * null. One window over one shuffle on the user key: the "last touch so
    * far" is carried by `last(..., ignoreNulls)` over ROWS UNBOUNDED
    * PRECEDING .. 1 PRECEDING, so there is no conversions×touches self-join
    * and no per-conversion rescan — at 100 TB this is a single exchange of
    * the event table, nothing more. `idCol` breaks timestamp ties
    * deterministically. */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, conversionType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    def carried(c: Column): Column =
      last(when(col(typeCol) =!= conversionType, c), ignoreNulls = true).over(w)
    events
      .withColumn("touch_id", carried(col(idCol)))
      .withColumn("touch_type", carried(col(typeCol)))
      .where(col(typeCol) === conversionType)
      .select(col(userCol), col(idCol), col(tsCol),
        col("touch_id"), col("touch_type"), col("value"))
  }

  /** Watermarked stream-stream interval join: each left event joins right
    * events with the same key whose timestamp falls in
    * `[leftTs - lookback, leftTs]` — the streaming twin of the batch
    * [[TemporalJoins.intervalOverlapJoin]] / as-of shapes (enrich
    * purchases with the clicks that preceded them, as both arrive).
    *
    * Both sides carry the same watermark and the join condition bounds
    * event time in BOTH directions, so Spark provably evicts join state:
    * each side retains only `watermark + lookback` of history per key —
    * the state store stays O(window), never O(stream), which is the only
    * shape that survives an unbounded stream. Output columns: key, left
    * columns, right columns (right ts renamed to avoid collision). */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, lookback: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val rightCols = right.columns.filterNot(_ == keyCol)
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lookback") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs"))
      .select(col(s"l.$keyCol").as(keyCol) +:
        left.columns.filterNot(_ == keyCol).map(c => col(s"l.$c")) ++:
        rightCols.map(c => col(s"r.$c")): _*)
  }

  def streamingFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], maxPerStep: Int = 64): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.size
    val typed = events
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)), col(typeCol))
      .as[(Long, Long, String)]
      .filter(r => stepIdx.contains(r._3))

    def furthest(times: Seq[Seq[Long]]): Int = {
      var prev = Long.MinValue
      var reached = 0
      var k = 0
      var continue = true
      while (continue && k < nSteps) {
        val hit =
          if (k == 0) times(0).headOption
          else times(k).find(_ > prev)
        hit match {
          case Some(t) => prev = t; reached = k + 1; k += 1
          case None => continue = false
        }
      }
      reached
    }

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Seq[Long]], (Long, Int)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, String)],
            state: GroupState[Seq[Seq[Long]]]) =>
          val cur = state.getOption.getOrElse(Seq.fill(nSteps)(Seq.empty[Long]))
          val buf = cur.map(s => scala.collection.mutable.TreeSet.from(s))
          it.foreach { case (_, micros, tpe) => buf(stepIdx(tpe)) += micros }
          val next = buf.map(_.take(maxPerStep).toSeq)
          state.update(next)
          val f = furthest(next)
          if (f >= 1) Iterator(user -> f) else Iterator.empty
      }
      .toDF(userCol, "furthest_step")
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

  /** Stream-ingest into a versioned lakehouse table. With `accumulate =
    * true`, each micro-batch APPENDS atomically via
    * [[graft.lakehouse.TableIO.appendTable]] — the published table IS the
    * accumulator (no in-memory state), so bytes written per batch is
    * O(batch), restarts resume from the durable table instead of silently
    * starting empty, and readers always see a complete consistent version.
    * With `accumulate = false` each batch atomically replaces the table
    * (latest-batch snapshot semantics). Returns the started query; callers
    * own its lifecycle.
    *
    * This is the "bronze table" ingest shape: Structured Streaming handles
    * watermarks/source offsets, the Versioned manifest commit makes each
    * batch's publish atomic. Accumulate-mode appends are EXACTLY-once:
    * the batch watermark `txn:<appId> = batchId` commits atomically with
    * the data (Delta's txnAppId/txnVersion idempotent-write pattern, same
    * key convention as [[graft.lakehouse.streaming.VersionedTableSink]]),
    * so a batch replayed after a crash between append commit and
    * checkpoint advance is recognized and skipped. Overwrite mode is
    * naturally idempotent (replay rewrites the same snapshot). `appId`
    * defaults to the checkpoint path (the stream's durable identity);
    * with NEITHER set the watermark is off — a checkpoint-less query can
    * never replay (there is nothing to recover from), and a fresh query's
    * batch numbering restarts at 0, which a per-table default would
    * wrongly read as a replay of the previous query's batches. */
  /** The exactly-once txn-watermark pair shared by the ingest operators:
    * the manifest-meta key `txn:<appId|checkpoint>` and a reader of the
    * last batch id committed under it (the same convention
    * VersionedTableSink stamps). One definition — the key format and the
    * lookup must never diverge between writers or replay detection
    * silently breaks. */
  private[ext] def txnWatermark(tableDir: String, checkpoint: Option[String],
      appId: Option[String]): (Option[String], () => Option[Long]) = {
    import graft.lakehouse.Versioned
    val txnKey = appId.orElse(checkpoint).map("txn:" + _)
    val committed = () =>
      txnKey.flatMap(k => Versioned.latestVersion(tableDir)
        .flatMap(Versioned.readManifest(tableDir, _))
        .flatMap(_.meta.get(k))
        .flatMap(s => scala.util.Try(s.toLong).toOption))
    (txnKey, committed)
  }

  def streamIngest(events: DataFrame, spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      accumulate: Boolean = false,
      checkpoint: Option[String] = None,
      appId: Option[String] = None) = {
    import graft.lakehouse.{Catalog, TableIO}
    val (txnKey, committedWatermark) =
      txnWatermark(Catalog.tablePath(lh, tableName), checkpoint, appId)
    val w = events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val df = batch.toDF()
        if (accumulate) {
          // replayed batch (crash between append and checkpoint advance):
          // the watermark committed with the data already covers it
          if (!committedWatermark().exists(_ >= batchId))
            TableIO.appendTable(spark, lh, tableName, df,
              extraMeta = txnKey.map(_ -> batchId.toString).toMap)
        } else TableIO.writeTable(spark, lh, tableName, df)
        ()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Streaming expectation gate (DLT `expect_or_quarantine` on a
    * stream): each micro-batch splits through ONE codegen'd gate pass —
    * passing rows append to `tableName`, failing rows to
    * `quarantineName` with their failed checks recorded — both as
    * ordinary versioned commits, so the quarantine table streams,
    * time-travels, and feeds CDF like any other. No state between
    * batches (the gate is per-row), so the per-batch cost is the two
    * appends: O(batch), files inherit by reference.
    *
    * Exactly-once: the gold and quarantine halves commit separately, so
    * EACH destination carries its own `txn:` watermark, committed
    * atomically with its half of the data (an empty half still commits a
    * marker-only version). A batch replayed after a crash — between the
    * two commits, or between both commits and the checkpoint advance —
    * re-lands ONLY the half whose watermark is missing: no double
    * appends, and a half-landed batch self-heals on restart. Same
    * checkpoint/appId contract as [[streamIngest]]. */
  def streamIngestGated(events: DataFrame, spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      quarantineName: String,
      checks: Seq[graft.lakehouse.ext.Quality.Expectation],
      checkpoint: Option[String] = None,
      appId: Option[String] = None) = {
    import graft.lakehouse.Catalog
    val (txnKey, goldWatermark) =
      txnWatermark(Catalog.tablePath(lh, tableName), checkpoint, appId)
    val (_, quarantineWatermark) =
      txnWatermark(Catalog.tablePath(lh, quarantineName), checkpoint, appId)
    val w = events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val goldDone = goldWatermark().exists(_ >= batchId)
        val quarantineDone = quarantineWatermark().exists(_ >= batchId)
        if (!(goldDone && quarantineDone))
          graft.lakehouse.Ingest.appendWithQuarantine(spark, lh, tableName,
            quarantineName, batch.toDF(), checks,
            extraMeta = txnKey.map(_ -> batchId.toString).toMap,
            landGold = !goldDone, landQuarantine = !quarantineDone)
        ()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Streaming UPSERT sink (the Delta `foreachBatch` MERGE pattern): each
    * micro-batch merges into the versioned table on `keyCols` — existing
    * keys update, new keys insert — and the batch id commits ATOMICALLY
    * in the same manifest as the merged data, so a batch replayed after a
    * crash between merge-commit and checkpoint advance is detected and
    * skipped: exactly-once end to end, the same txn-watermark contract as
    * [[streamIngest]] and the graft-table sink. The first batch
    * bootstraps the table. Deletes do not flow through upserts — pair
    * with [[graft.lakehouse.TableIO.applyChanges]] over a change feed for
    * full replication. Typical upstream: an Update-mode streaming
    * aggregation emitting one changed row per key per trigger (mergeTable
    * enforces batch key-uniqueness).
    *
    * At 100 TB the per-batch cost is the merge's: only files holding
    * updated keys rewrite; untouched files inherit by reference. */
  def streamUpsert(updates: DataFrame, spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      keyCols: Seq[String],
      checkpoint: Option[String] = None,
      appId: Option[String] = None) = {
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    val tableDir = Catalog.tablePath(lh, tableName)
    val (txnKey, committedWatermark) =
      txnWatermark(tableDir, checkpoint, appId)
    val w = updates.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!committedWatermark().exists(_ >= batchId)) {
          val meta = txnKey.map(_ -> batchId.toString).toMap
          if (Versioned.latestVersion(tableDir).isEmpty)
            TableIO.writeTable(spark, lh, tableName, batch.toDF(),
              extraMeta = meta)
          else
            TableIO.mergeTable(spark, lh, tableName, batch.toDF(), keyCols,
              extraMeta = meta)
        }
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
    * durable parquet version), never held as an in-memory lineage chain —
    * an executor loss cannot destroy it, and on restart the first batch
    * bootstraps the band index by re-hashing the published table once
    * (bounded, one-time) instead of silently starting empty and
    * overwriting history. Survivors are published as an APPENDED version
    * (file-level commit): per-batch publish cost is O(batch) — the corpus'
    * existing files are inherited by reference, never rewritten, so a
    * long-lived stream writes O(total ingested) bytes, not O(n²). Returns
    * the started query; schema must be (idCol, textCol, …). */
  def streamIngestDeduped(docs: DataFrame, spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      idCol: String, textCol: String, threshold: Double = 0.8,
      checkpoint: Option[String] = None,
      appId: Option[String] = None) = {
    import graft.lakehouse.{Catalog, TableIO}
    // exactly-once publish: same txn-watermark pattern as [[streamIngest]]
    // (the near-dup anti-join would organically drop a replayed batch as a
    // self-match against the published corpus, but only AFTER re-hashing
    // it — the watermark skip is both cheaper and exact). Off without a
    // durable identity: a checkpoint-less query cannot replay, and its
    // restart renumbers batches from 0.
    val (txnKey, committedWatermark) =
      txnWatermark(Catalog.tablePath(lh, tableName), checkpoint, appId)
    var index: Option[DataFrame] = None
    var bootstrapped = false
    def publishedCorpus(): Option[DataFrame] =
      scala.util.Try(TableIO.selectTable(spark, lh, tableName)).toOption
        .filter(_ => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
          graft.lakehouse.Catalog.tablePath(lh, tableName))))
    val w = docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val df = batch.toDF()
        if (!bootstrapped) { // restart path: rebuild the index from disk once
          index = publishedCorpus().map(c =>
            Dedup.minHashBandIndex(c, idCol, textCol).localCheckpoint(true))
          bootstrapped = true
        }
        if (!committedWatermark().exists(_ >= batchId)) {
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
            // O(batch) publish: survivors append as new files, the corpus'
            // files are inherited by reference in the new version's manifest
            TableIO.appendTable(spark, lh, tableName, survivors,
              extraMeta = txnKey.map(_ -> batchId.toString).toMap)
            val newBands = Dedup.minHashBandIndex(survivors, idCol, textCol)
            index = Some(index.map(_.unionByName(newBands)).getOrElse(newBands)
              .localCheckpoint(true))
          }
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

  /** Event-time hygiene audit — the ONE-ROW report that sizes a
    * streaming watermark before any streaming job exists: over an
    * arrival-ordered event log (`seqCol` = arrival sequence), how many
    * events arrived with an event time EARLIER than something already
    * seen for the same key, how many keys are affected, the worst
    * regression in exact microseconds, and the late share in exact
    * permille. `withWatermark(maxRegression)` then provably drops
    * nothing on a replay of this log.
    *
    * Scale shape: one window partitioned by the key (never unbounded)
    * to compute each event's preceding per-key max, then ONE global
    * aggregation to a single row; integer microsecond arithmetic
    * end-to-end. */
  def eventTimeAudit(df: DataFrame, keyCol: String, seqCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(seqCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMax = max(col(tsCol)).over(w)
    val lateUs = when(col(tsCol) < prevMax,
      unix_micros(prevMax) - unix_micros(col(tsCol)))
    df.select(col(keyCol), col(seqCol), col(tsCol))
      .withColumn("__late_us", lateUs)
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("__late_us").isNotNull, 1L).otherwise(0L)).as("n_late"),
        countDistinct(when(col("__late_us").isNotNull, col(keyCol)))
          .as("n_keys_affected"),
        coalesce(max(col("__late_us")), lit(0L)).as("max_regression_us"))
      .withColumn("late_permille", expr("(n_late * 1000) div n_events"))
  }

  /** Per-key state for [[streamEventTimeAudit]]: the running per-key max
    * event time plus the audit counters folded so far. */
  case class EventTimeAuditState(maxTsUs: Long, nEvents: Long,
    nLate: Long, maxRegressionUs: Long)

  /** Streaming twin of [[eventTimeAudit]] — the same late-arrival stats
    * maintained INCREMENTALLY on a live stream (measure lateness while
    * it happens, then size the watermark), instead of auditing a
    * replayed log after the fact. Per-key `mapGroupsWithState` keeps
    * exactly (maxTs, 3 counters) — O(keys) state, never O(stream) — and
    * emits each key's updated totals every micro-batch (update mode):
    * (key, n_events, n_late, max_regression_us). The global one-row
    * audit is a bounded fold over the LATEST row per key — sum the
    * counts, max the regression — and equals [[eventTimeAudit]] over
    * the replayed log bit-for-bit (spec-asserted): events fold in
    * `seqCol` order within each batch, and batch arrival order is
    * arrival order.
    *
    * `seqCol` must be a long arrival sequence; `keyCol` is cast to
    * string for the state key (audit identity, not a join key). */
  def streamEventTimeAudit(events: DataFrame, keyCol: String,
      seqCol: String, tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val typed = events
      .select(col(keyCol).cast("string"), col(seqCol).cast("long"),
        unix_micros(col(tsCol)))
      .as[(String, Long, Long)]
    typed
      .groupByKey(_._1)
      .mapGroupsWithState[EventTimeAuditState, (String, Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, Long, Long)],
            state: org.apache.spark.sql.streaming.GroupState[EventTimeAuditState]) =>
          var s = state.getOption.getOrElse(
            EventTimeAuditState(Long.MinValue, 0L, 0L, 0L))
          // fold in arrival order WITHIN the batch (the iterator's order
          // is not contractual; the arrival sequence is)
          it.toSeq.sortBy(_._2).foreach { case (_, _, tsUs) =>
            val late = s.maxTsUs != Long.MinValue && tsUs < s.maxTsUs
            s = EventTimeAuditState(
              math.max(s.maxTsUs, tsUs),
              s.nEvents + 1L,
              s.nLate + (if (late) 1L else 0L),
              if (late) math.max(s.maxRegressionUs, s.maxTsUs - tsUs)
              else s.maxRegressionUs)
          }
          state.update(s)
          (key, s.nEvents, s.nLate, s.maxRegressionUs)
      }
      .toDF(keyCol, "n_events", "n_late", "max_regression_us")
  }

  /** Conversion-latency percentiles: for users whose journey reaches
    * `fromType` and then `toType`, the exact rank-percentiles of the
    * seconds between first `fromType` and the first `toType` at-or-after
    * it — the distribution table behind the funnel's flat conversion
    * rate ([[funnel]] counts WHO converts; this measures HOW LONG).
    * Integer end to end: epoch-second latencies, rank = ceil(n·p/1000)
    * over the per-latency count frame (the winsorizedMean convention).
    * Two user-keyed aggregations + bounded-frame windows. */
  def conversionLatency(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, fromType: String, toType: String,
      permilles: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      "conversionLatency: permilles must be in [1, 1000]")
    val f = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("__u"))
      .agg(min(unix_timestamp(col(tsCol))).as("__f"))
    val t = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("__u"),
        unix_timestamp(col(tsCol)).as("__t"))
    val lat = f.join(t, Seq("__u"))
      .filter(col("__t") >= col("__f"))
      .groupBy("__u")
      .agg((min("__t") - max("__f")).as("lat"))
    val counts = lat.groupBy("lat").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy().orderBy("lat")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val started = f.agg(count(lit(1)).as("n_started"))
    counts
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n_converted",
        sum("c").over(Window.partitionBy()))
      .select(col("lat"), col("cum"), col("n_converted"),
        explode(typedlit(permilles)).as("p"))
      .filter(col("cum") >= expr("(n_converted * p + 999) div 1000"))
      .groupBy("p")
      .agg(min("lat").as("latency_s"), max("n_converted").as("n_converted"))
      .crossJoin(started)
      .select(col("p"), col("latency_s"), col("n_converted"),
        col("n_started"))
  }
}
