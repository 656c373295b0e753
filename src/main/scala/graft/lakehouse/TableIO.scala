package graft.lakehouse

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import java.util.Comparator
import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode, SparkSession}

/** Table read/write surface over the local lakehouse: the reference's Delta
  * scans/sinks re-expressed over Parquet. Overwrites go through the
  * [[Versioned]] commit protocol (immutable `_vN` snapshots + atomic
  * `_LATEST` pointer swap), approximating Delta's atomic
  * `mode("overwrite").option("overwriteSchema","true")` (common.py:531):
  * concurrent readers keep a consistent snapshot across an overwrite.
  *
  * Reference: ecu/sbl/aace/datalake/common.py:359-538.
  */
object TableIO {

  /** common.py:359-367 — SQL text generator; `distinct` emits GROUP BY over
    * the full select list (distinct-via-group-by — Catalyst canonicalizes
    * both to the same Aggregate). */
  def getSQL(tableName: String, cols: Seq[String], distinct: Boolean = false): String = {
    val colList = cols.map(Catalog.escapeName).mkString(", ")
    val base = s"SELECT $colList FROM ${Catalog.escapeName(tableName)}"
    if (distinct && cols != Seq("*")) s"$base GROUP BY $colList" else base
  }

  /** common.py:440-459 (__selectTable) — the primary scan: read parquet at
    * the table/view path, register a uuid-named temp view, run `query`
    * (default `SELECT t.* FROM <view> AS t`). AnalysisExceptions are
    * re-thrown with the root cause extracted (common.py:398-410). */
  private def selectTableOrView(
      spark: SparkSession,
      lh: LakehouseProps,
      tableName: String,
      query: Option[String],
      tableOrView: String): DataFrame = {
    val path = Versioned.readPath(
      if (tableOrView == "view") Catalog.viewPath(lh, tableName)
      else Catalog.tablePath(lh, tableName))
    try {
      val df = spark.read.parquet(path)
      val tempName = Catalog.getTempTableName(tableName)
      df.createOrReplaceTempView(tempName)
      val sql = query
        .map(_.replace(s"{table}", tempName)) // allow callers to target the view
        .getOrElse(s"SELECT t.* FROM $tempName AS t")
      spark.sql(sql)
    } catch {
      case e: AnalysisException => throw new AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"selectTable($tableName) failed: ${rootCause(e).getMessage}"),
        cause = Some(e))
    }
  }

  /** Walk the cause chain to the innermost throwable — the analogue of the
    * reference's `extract_actual_error` "Caused by:" scrape (common.py:398-410). */
  def rootCause(t: Throwable): Throwable = {
    var cur = t
    while (cur.getCause != null && (cur.getCause ne cur)) cur = cur.getCause
    cur
  }

  /** common.py:461-463 */
  def selectTable(spark: SparkSession, lh: LakehouseProps, tableName: String,
      query: Option[String] = None): DataFrame =
    selectTableOrView(spark, lh, tableName, query, "table")

  /** common.py:465-467 */
  def selectView(spark: SparkSession, lh: LakehouseProps, viewName: String,
      query: Option[String] = None): DataFrame =
    selectTableOrView(spark, lh, viewName, query, "view")

  /** common.py:475-489 — the reference builds `SELECT <cols> FROM t WHERE
    * <cond>` but (a) drops the space before WHERE and (b) never passes the
    * built query to selectTable, so it always returns the whole table. We
    * implement the INTENDED semantics (projection + condition pushed into
    * the scan); divergence documented in SURVEY §7. */
  def readTable(spark: SparkSession, lh: LakehouseProps, tableName: String,
      columns: Seq[String] = Seq("*"), condition: String = ""): DataFrame = {
    val base = selectTable(spark, lh, tableName)
    val projected =
      if (columns == Seq("*")) base
      else base.select(columns.map(org.apache.spark.sql.functions.col): _*)
    if (condition.trim.isEmpty) projected
    else projected.where(condition)
  }

  /** common.py:377-378 — projection (+optional distinct) scan. */
  def getColsFromTable(spark: SparkSession, lh: LakehouseProps, tableName: String,
      cols: Seq[String], distinct: Boolean = false): DataFrame = {
    val projected = readTable(spark, lh, tableName, cols)
    if (distinct) projected.distinct() else projected
  }

  /** common.py:525-538 — overwrite-write (optionally Hive-style partitioned),
    * then record `{lakehouse, shape, columns, path}` into the registry.
    * The reference's post-write `dfShape` re-counts the un-cached lineage;
    * we count the written files instead (same number, one scan of the
    * just-written parquet — cheaper at scale). */
  def writeTable(spark: SparkSession, lh: LakehouseProps, tableName: String,
      df: DataFrame, partitionBy: Seq[String] = Seq.empty,
      sortBy: Seq[String] = Seq.empty): TableInfo = {
    val tableDir = Catalog.tablePath(lh, tableName)
    // sortBy = data clustering: range-partition then sort within partitions
    // so each parquet file covers a narrow key range — file- and
    // row-group-level min/max statistics then let later scans with
    // predicates on those columns skip most of a 100 TB table
    val clustered =
      if (sortBy.isEmpty) df
      else df.repartitionByRange(sortBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(sortBy.map(org.apache.spark.sql.functions.col): _*)
    val dataPath = Versioned.commit(tableDir) { target =>
      // the commit protocol already claimed `target` atomically (racing
      // writers failed loudly there); Append fills the empty claimed dir
      val writer = clustered.write.mode(SaveMode.Append)
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
       else writer).parquet(target)
    }
    val written = spark.read.parquet(dataPath)
    val info = TableInfo(lh.lakehouseName, written.count(), df.columns.length,
      df.columns.toSeq, tableDir, partitionBy)
    Catalog.recordTable(tableName, written, info)
    info
  }

  /** The Hive partitioning of `tableName`, detected from the CURRENT
    * snapshot's directory layout (nested `col=value` levels). The on-disk
    * layout is the source of truth — a session registry keyed by bare table
    * name would be blind in a fresh JVM and collide across lakehouses.
    * Maintenance rewrites (compact, merge) must preserve this. */
  private def currentPartitioning(lh: LakehouseProps, tableName: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var dir = Paths.get(currentDataPath(lh, tableName))
    var descend = true
    while (descend && Files.isDirectory(dir)) {
      val s = Files.list(dir)
      val level =
        try s.iterator().asScala.toSeq
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.matches("[^=]+=.*"))
        finally s.close()
      level.headOption match {
        case Some(d) =>
          out += d.getFileName.toString.split("=", 2)(0)
          dir = d
        case None => descend = false
      }
    }
    out.result()
  }

  /** The parquet directory a reader of `tableName` scans right now (the
    * latest committed snapshot). */
  def currentDataPath(lh: LakehouseProps, tableName: String): String =
    Versioned.readPath(Catalog.tablePath(lh, tableName))

  /** Upsert (Delta MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT,
    * whole-row form): rows in `updates` replace current rows with the same
    * `keyCols`; unmatched update rows append. Implemented as a left-anti
    * join (current minus updated keys) unioned with the updates, committed
    * as a new atomic version — readers never observe a half-merged table.
    * One shuffle on the key columns; the schemas must match (by name). */
  def mergeTable(spark: SparkSession, lh: LakehouseProps, tableName: String,
      updates: DataFrame, keyCols: Seq[String],
      checkDuplicateKeys: Boolean = true): TableInfo = {
    require(keyCols.nonEmpty, "mergeTable needs at least one key column")
    val keyColumns = keyCols.map(org.apache.spark.sql.functions.col)
    if (checkDuplicateKeys) {
      // Delta MERGE errors on multiple source rows per key; silently
      // unioning both would corrupt key uniqueness. One small agg on the
      // (typically tiny) update set; skippable for pre-deduped pipelines.
      val dups = updates.groupBy(keyColumns: _*).count()
        .filter(org.apache.spark.sql.functions.col("count") > 1).limit(1)
        .collect()
      require(dups.isEmpty,
        s"mergeTable: updates contain multiple rows for key ${dups.head}")
    }
    val current = selectTable(spark, lh, tableName)
    val kept = current.join(updates.select(keyColumns: _*).distinct(),
      keyCols, "left_anti")
    writeTable(spark, lh, tableName, kept.unionByName(updates),
      partitionBy = currentPartitioning(lh, tableName))
  }

  /** Time-travel read: scan a specific committed version's immutable
    * snapshot (within the retention window — older versions are swept by
    * [[Versioned.commit]]). */
  def selectTableVersion(spark: SparkSession, lh: LakehouseProps,
      tableName: String, version: Long): DataFrame = {
    val tableDir = Catalog.tablePath(lh, tableName)
    val dir = java.nio.file.Paths.get(tableDir, s"_v$version")
    // the marker check rejects orphaned/in-flight _vN directories (a crashed
    // writer's partial files are NOT a committed snapshot)
    require(Versioned.isCommitted(tableDir, version) && Files.isDirectory(dir),
      s"version $version of $tableName was never committed or has been " +
        s"swept (retention window is ${Versioned.Retain} versions)")
    spark.read.parquet(dir.toString)
  }

  /** Small-files compaction (the OPTIMIZE half of the Delta story the
    * north-star names): rewrite the current snapshot into
    * ceil(bytes / targetFileBytes) files and commit it as a new version
    * through the same atomic protocol — readers of the old snapshot are
    * untouched, and a crash mid-compaction leaves the table on the old
    * version. `coalesce` (not `repartition`): reducing file count needs no
    * shuffle. Returns the new TableInfo. */
  def compactTable(spark: SparkSession, lh: LakehouseProps, tableName: String,
      targetFileBytes: Long = 128L * 1024 * 1024): TableInfo = {
    val dataDir = Paths.get(currentDataPath(lh, tableName))
    val bytes = {
      val s = Files.walk(dataDir)
      try s.filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .mapToLong(p => Files.size(p)).sum()
      finally s.close()
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = selectTable(spark, lh, tableName)
    // preserve the table's Hive partitioning through the rewrite — Delta
    // OPTIMIZE, which this models, never flattens a partitioned table
    writeTable(spark, lh, tableName, df.coalesce(nFiles),
      partitionBy = currentPartitioning(lh, tableName))
  }

  /** Views write path — the reference defines `viewPath` (common.py:392) and
    * reads views via selectView, but nothing in the library ever writes one;
    * we provide the missing producer so the Views/ directory is a real
    * round-trippable surface (materialized-view semantics: a parquet
    * snapshot of the DataFrame, overwritten atomically like writeTable). */
  def writeView(spark: SparkSession, lh: LakehouseProps, viewName: String,
      df: DataFrame): Unit =
    Versioned.commit(Catalog.viewPath(lh, viewName)) { target =>
      df.write.mode(SaveMode.Append).parquet(target)
    }

  /** common.py:512-517 — the reference's dropTable is doubly bugged (spark
    * self-assignment; Delta row-delete instead of drop). Implement the
    * intent: remove the table directory + forget it. */
  def dropTable(spark: SparkSession, lh: LakehouseProps, tableName: String): Unit = {
    val dir = Paths.get(Catalog.tablePath(lh, tableName))
    if (Files.exists(dir))
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
    Catalog.forgetTable(tableName)
  }

  /** common.py:905-908 — (rowCount, colCount) + column list. One count()
    * action; caller should persist first when reusing the DataFrame. */
  def dfShape(df: DataFrame): (Long, Int, Seq[String]) =
    (df.count(), df.columns.length, df.columns.toSeq)

  /** Read a parquet file whose `tsCols` are TIMESTAMP(NANOS) — which Spark 4
    * rejects outright — by reading nanos as long and truncating to
    * microsecond TimestampType. Integer `div` (not `/`): ns-since-epoch
    * exceeds 2^53, double division would corrupt low bits. */
  def readParquetNanoTs(spark: SparkSession, path: String,
      tsCols: Seq[String] = Seq("ts")): DataFrame = {
    // nanosAsLong is session-wide; save/restore around the eager schema
    // resolution so other parquet reads keep loud nano-timestamp failures
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(path)
      raw.schema // force analysis while the conf is set
      tsCols.filter(raw.columns.contains).foldLeft(raw) { (d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$c div 1000")))
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
