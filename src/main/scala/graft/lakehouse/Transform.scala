package graft.lakehouse

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Column-level transformation operators.
  * Reference: ecu/sbl/aace/datalake/common.py:732-908.
  */
object Transform {

  /** common.py:762-764 — null → literal text. */
  def setDFTextWhenNull(df: DataFrame, columnName: String, nullVal: String): DataFrame =
    df.withColumn(columnName,
      when(col(columnName).isNull, lit(nullVal)).otherwise(col(columnName)))

  /** common.py:772-779 — null → 0 for each listed column that exists
    * (silently skips absent columns, as the reference does). */
  def setNullToZero(df: DataFrame, columnNames: Seq[String]): DataFrame =
    columnNames.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNull, lit(0)).otherwise(col(c)))
    }

  /** common.py:787-799 — append one synthetic row: leading varargs +
    * null-padding to schema width, 0-fill `isActualMetadata` when present,
    * union (by position), re-sort by the first schema field. */
  def createExtraRow(df: DataFrame, args: Any*): DataFrame = {
    val spark = df.sparkSession
    val values = args ++ Seq.fill(df.schema.fields.length - args.length)(null)
    val newRow = Row.fromSeq(values)
    val newRowDf = setNullToZero(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(newRow), 1), df.schema),
      Seq("isActualMetadata"))
    df.union(newRowDf).orderBy(df.schema.fields.head.name)
  }

  /** common.py:807-810 — every column → `<prefix>_<col>`. */
  def renameColumnsWithPrefix(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(c => s"${prefix}_$c").toIndexedSeq: _*)

  /** common.py:818-828 — strip any of N prefixes (+ the following '_')
    * wherever the stripped name is non-empty. Sequential like the
    * reference: later prefixes see earlier renames. */
  def renameColumnsStripPrefix(df: DataFrame, prefixes: Seq[String]): DataFrame =
    prefixes.foldLeft(df) { (d, p) =>
      d.columns.foldLeft(d) { (dd, c) =>
        if (c.startsWith(p)) {
          val stripped = c.substring(p.length).replaceAll("^_+", "")
          if (stripped.nonEmpty) dd.withColumnRenamed(c, stripped) else dd
        } else dd
      }
    }

  /** common.py:836-869 — validated cast: rename `c`→`c_orig`, new `c` =
    * cast-or-null at the original position, then keep `c_orig` (and warn)
    * iff any non-null value failed to cast, else drop it.
    *
    * `try_cast` gives the reference's cast-failure→null semantics under
    * Spark 4's default ANSI mode. `validate=false` skips the per-column
    * count() action (one full pass per column — avoid on 100 TB inputs
    * when the cast is known-safe). */
  def castColumns(df: DataFrame, castCols: Seq[String], cast: String,
      validate: Boolean = true): DataFrame =
    castCols.foldLeft(df) { (d0, c) =>
      val origName = s"${c}_orig"
      val d1 = (if (d0.columns.contains(origName)) d0.drop(origName) else d0)
        .withColumnRenamed(c, origName)
      val cols = {
        val cs = d1.columns.toBuffer
        cs.insert(cs.indexOf(origName), c)
        cs.toSeq
      }
      val d2 = d1
        // ALWAYS backtick-quote (escaping embedded backticks): escapeName
        // splits on '.', so a column literally named "a.b_orig" would
        // parse as struct-field access — unresolvable or, worse, silently
        // resolving against a real struct column
        .withColumn(c, expr(
          s"try_cast(`${origName.replace("`", "``")}` AS $cast)"))
        .select(cols.map(col): _*)
      if (!validate) d2.drop(origName)
      else {
        val failures = d2.filter(col(origName).isNotNull && col(c).isNull).count()
        if (failures == 0) d2.drop(origName)
        else {
          System.err.println(s"$c : $cast : $failures : Unable to cast all values")
          d2
        }
      }
    }

  /** common.py:877-878 */
  def castColumnsToInt(df: DataFrame, castCols: Seq[String]): DataFrame =
    castColumns(df, castCols, "int")

  /** common.py:888-897 — API-parity surrogate index:
    * `monotonically_increasing_id() + 1 + indexStart` inserted at
    * `newColPos`, case-insensitively replacing any existing column of the
    * same name. NOT contiguous across partitions (ids are
    * partition-prefixed) — that matches the reference's caveat; use
    * [[addIndexColContiguous]] where deterministic contiguous keys are
    * required. */
  def addIndexCol(df: DataFrame, indexColName: String, indexStart: Long = 0,
      newColPos: Int = 0): DataFrame = {
    if (indexColName == null || indexColName.isEmpty) return df
    val columns = df.columns.filterNot(_.equalsIgnoreCase(indexColName)).toBuffer
    val d = df.withColumn(indexColName, monotonically_increasing_id() + 1 + indexStart)
    // Python list.insert semantics (the reference API's contract):
    // negative positions count from the end, clamped at both bounds
    val pos = math.max(0, math.min(columns.length,
      if (newColPos < 0) columns.length + newColPos else newColPos))
    columns.insert(pos, indexColName)
    d.select(columns.toSeq.map(col): _*)
  }

  /** Deterministic, contiguous surrogate index that stays distributed:
    * RDD `zipWithIndex` over the (already-sorted) input preserves both the
    * partitioning and the global sort order, so index i == row's rank —
    * without collapsing to a single partition the way
    * `row_number() OVER (ORDER BY …)` would. Costs one extra lightweight
    * job (per-partition counts). Scale path for 100 TB dimension builds. */
  def addIndexColContiguous(df: DataFrame, indexColName: String,
      indexStart: Long = 0, newColPos: Int = 0): DataFrame = {
    if (indexColName == null || indexColName.isEmpty) return df
    val base = df.drop(df.columns.filter(_.equalsIgnoreCase(indexColName)): _*)
    val schema = StructType(base.schema.fields :+
      StructField(indexColName, LongType, nullable = false))
    val rdd = base.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1 + indexStart))
    }
    val withIdx = base.sparkSession.createDataFrame(rdd, schema)
    val columns = base.columns.toBuffer
    val pos = math.max(0, math.min(columns.length,
      if (newColPos < 0) columns.length + newColPos else newColPos))
    columns.insert(pos, indexColName)
    withIdx.select(columns.toSeq.map(col): _*)
  }

  /** common.py:732-754 — distinct (+optional per-group count) extraction
    * with a prepended surrogate index: optional RawScore filter →
    * groupBy(colNames) [+ count(rowCountCol) renamed to rowCountCol] →
    * orderBy(colNames asc) → index column `index<cols-sans-underscores>`.
    *
    * Uses the contiguous index so surrogate keys are deterministic
    * (groupBy output is unique per key combo ⇒ the sort is total) and
    * oracle-comparable; the reference's monotonically_increasing_id is only
    * contiguous single-partition (SURVEY §7). */
  def getDistinctValsFromDataRowsInt(df: DataFrame, colNames: Seq[String],
      rowCountCol: Option[String] = None, indexStart: Long = 0,
      suppressNullRawScore: Boolean = false): DataFrame = {
    val filtered =
      if (suppressNullRawScore) df.filter(col("RawScore").isNotNull) else df
    val grouped = rowCountCol match {
      case Some(rc) =>
        filtered.groupBy(colNames.map(col): _*).agg(count(col(rc)).as(rc))
      case None =>
        filtered.groupBy(colNames.map(col): _*).count().drop("count")
    }
    val sorted = grouped.orderBy(colNames.map(c => col(c).asc): _*)
    val indexCol = "index" + colNames.mkString("").replace("_", "")
    addIndexColContiguous(sorted, indexCol, indexStart, newColPos = 0)
  }

  /** common.py:905-908 — see TableIO.dfShape; re-exported here for parity
    * with the reference's module layout. */
  def dfShape(df: DataFrame): (Long, Int, Seq[String]) = TableIO.dfShape(df)
}
