package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks natively. The as-of join (each left row
  * matched to the most recent right row at or before its timestamp, per
  * key) is composed from existing operators — union-tag + one ordered
  * window with a carried last-known value — rather than a custom
  * SparkStrategy: a single hash-partitioned shuffle on the key columns and
  * a per-key sort, the same cost profile a dedicated physical operator
  * would have, with Catalyst/AQE still free to plan around it.
  *
  * Scale notes: state per key is one carried value (the window frame is
  * running, never buffered), so a 100 TB fact side streams through
  * sort-merge machinery without blowup. Right rows should be unique per
  * (key, ts) — pre-aggregate otherwise — because the carry among equal
  * timestamps is order-dependent; with unique (key, ts) the result is
  * deterministic and matches DuckDB's native ASOF LEFT JOIN row for row.
  */
object TemporalJoins {

  /** Left as-of join: every left row, plus `valueCols` from the latest
    * right row with `right.tsCol <= left.tsCol` for the same `keyCols`
    * (null when no prior right row exists). Right value columns are
    * suffixed with `suffix`. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String],
      suffix: String = "_asof"): DataFrame = {
    val common = keyCols :+ tsCol
    val leftOnly = left.columns.toSeq.filterNot(common.contains)
    val rightTypes = valueCols.map(c => c -> right.schema(c).dataType).toMap
    val leftTypes = leftOnly.map(c => c -> left.schema(c).dataType).toMap

    // right rows sort BEFORE left rows at the same timestamp (`<=` match);
    // all value columns ride ONE struct so they come atomically from the
    // same right row even when individual values are null
    val packed = struct(valueCols.map(col): _*)
    val nullPacked = lit(null).cast(
      org.apache.spark.sql.types.StructType(valueCols.map(c =>
        org.apache.spark.sql.types.StructField(c, rightTypes(c)))))
    val lTagged = left.select(
      common.map(col) ++ Seq(lit(1).as("__isl")) ++
        leftOnly.map(col) ++ Seq(nullPacked.as("__rv")): _*)
    val rTagged = right.select(
      common.map(col) ++ Seq(lit(0).as("__isl")) ++
        leftOnly.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(packed.as("__rv")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__isl").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried.filter(col("__isl") === 1)) { (df, c) =>
      df.withColumn(s"$c$suffix", col(s"__rv.$c"))
    }.drop("__isl", "__rv")
  }

  /** NEAREST-within-tolerance as-of join ([[asofJoin]]'s symmetric
    * sibling — sensor fusion / feature-at-time lookups where the closest
    * reading on EITHER side wins): each left row matches the right row
    * with minimal |Δts| ≤ tolerance (ties: the earlier right row), or
    * nulls if none. Hash-joinable at scale by the [[rangeJoin]] trick:
    * right rows emit into their tolerance-width bin and both neighbors,
    * so every candidate pair meets on exactly one bin equi-join (3×
    * right-side blowup, never a BNLJ); one per-left-row argmin window on
    * (key, id) follows. `leftIdCol` must identify left rows uniquely —
    * the argmin needs a deterministic frame. */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftIdCol: String, tsCol: String,
      valueCols: Seq[String], toleranceMicros: Long,
      suffix: String = "_near"): DataFrame = {
    require(toleranceMicros > 0, "asofJoinNearest needs a positive tolerance")
    val rExp = right
      .withColumn("__rbin", expr(s"unix_micros($tsCol) div ${toleranceMicros}L"))
      .select((keyCols.map(col) :+ col(tsCol).as("__rts") :+
        struct(valueCols.map(col): _*).as("__rv") :+ col("__rbin")): _*)
      .withColumn("__bin", explode(array(
        col("__rbin") - 1, col("__rbin"), col("__rbin") + 1)))
      .drop("__rbin")
    val lBinned = left.withColumn("__bin",
      expr(s"unix_micros($tsCol) div ${toleranceMicros}L"))
    val cand = lBinned
      .join(rExp, keyCols :+ "__bin")
      .withColumn("__d", abs(expr(s"unix_micros($tsCol)") -
        expr("unix_micros(__rts)")))
      .filter(col("__d") <= toleranceMicros)
    val w = Window.partitionBy((keyCols :+ leftIdCol).map(col): _*)
      .orderBy(col("__d").asc, col("__rts").asc)
    val best = cand
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((Seq(col(leftIdCol)) ++
        valueCols.map(c => col(s"__rv.$c").as(s"$c$suffix")) ++
        Seq(col("__rts").as(s"ts$suffix"), col("__d").as("delta_micros"))): _*)
    left.join(best, Seq(leftIdCol), "left")
  }

  /** Range (interval) join: left rows matched to every right row whose
    * `[loCol, hiCol]` interval contains `valueCol` (inclusive ends, inner
    * join). Spark plans a raw BETWEEN join as a broadcast-nested-loop or
    * cartesian product — quadratic at scale — so this bucketizes instead:
    * each interval explodes into the fixed-width bins it spans, each left
    * value lands in exactly one bin, the join becomes an equi-join on the
    * bin id, and an exact filter trims bin-edge false positives. Each
    * (value, containing-interval) pair meets in exactly one bin, so no
    * dedup is needed.
    *
    * `binWidth` trades interval-side blowup (span/binWidth rows per
    * interval) against bin selectivity; pick it near the typical interval
    * span. Column names must not collide across the two inputs (alias
    * first — same contract as a plain join). */
  def rangeJoin(left: DataFrame, valueCol: String, right: DataFrame,
      loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    val rb = right.withColumn("__bin", explode(sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))))
    lb.join(rb, "__bin")
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval overlap join: all (left, right) pairs whose [start, end]
    * timestamp intervals intersect, plus an equi-key — the "concurrent
    * sessions / overlapping reservations" shape. Both sides are
    * replicated to the `binMicros`-wide time bins they span and equi-
    * joined on (key, bin) — a hash join Catalyst can shuffle-plan —
    * NEVER a nested-loop inequality join. A pair sharing several bins
    * would match once per shared bin, so each pair is counted only in its
    * canonical bin (the later of the two start bins); the exact overlap
    * predicate then discards same-bin non-overlaps. Right columns get
    * `suffix`. Pick binMicros near the typical interval length: the
    * replication factor is len/bin + 1 per row, the per-bin bucket is the
    * skew bound. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], startCol: String, endCol: String,
      binMicros: Long, suffix: String = "_r"): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    // cast covers TIMESTAMP_NTZ inputs (unix_micros only takes TIMESTAMP;
    // the session is pinned UTC so the cast is deterministic)
    def binned(df: DataFrame) = df
      .withColumn("__s", unix_micros(col(startCol).cast("timestamp")))
      .withColumn("__e", unix_micros(col(endCol).cast("timestamp")))
      .withColumn("__sbin", floor(col("__s") / binMicros.toDouble).cast("long"))
      .withColumn("__bin", explode(sequence(col("__sbin"),
        floor(col("__e") / binMicros.toDouble).cast("long"))))
    val l = binned(left)
    val nonJoin = right.columns.filterNot(keyCols.contains).toSeq
    val r = binned(right).select(
      (keyCols.map(col) :+ col("__bin") :+ col("__sbin").as("__sbin_r") :+
        col("__s").as("__s_r") :+ col("__e").as("__e_r")) ++
        nonJoin.map(c => col(c).as(s"$c$suffix")): _*)
    l.join(r, keyCols :+ "__bin")
      // canonical bin: the later interval start's bin — counts each
      // overlapping pair exactly once
      .where(col("__bin") === greatest(col("__sbin"), col("__sbin_r")) &&
        col("__s") <= col("__e_r") && col("__s_r") <= col("__e"))
      .drop("__s", "__e", "__sbin", "__bin", "__sbin_r", "__s_r", "__e_r")
  }

  /** Per-key interval coverage: merge each key's overlapping-or-touching
    * intervals into maximal islands (gaps-and-islands, the q139 span
    * machinery over time instead of token positions) and report the
    * numbers a billing / SLA / session audit wants — raw interval count,
    * merged island count, total COVERED microseconds (double-counted
    * overlap collapsed), and the end-to-end span. "Touching" merges
    * (start == previous max end ⇒ same island — end-exclusive
    * semantics); all arithmetic in exact integer microseconds.
    *
    * Scale shape: ONE window partitioned by the key (bounded by that
    * key's interval count) + two aggregations; no joins, nothing
    * quadratic in overlaps — the naive pairwise-overlap subtraction is
    * O(n²) per key and wrong past two-way overlap. */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val valid = df.where(col(startCol).isNotNull && col(endCol).isNotNull &&
      col(startCol) <= col(endCol))
    val byKey = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      byKey.rowsBetween(Window.unboundedPreceding, -1))
    val islands = valid
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(count(lit(1)).as("__n"),
        min(col(startCol)).as("__s"), max(col(endCol)).as("__e"))
    islands.groupBy(col(keyCol))
      .agg(
        sum("__n").cast("long").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(unix_micros(col("__e")) - unix_micros(col("__s")))
          .cast("long").as("covered_us"),
        (max(unix_micros(col("__e"))) - min(unix_micros(col("__s"))))
          .cast("long").as("span_us"))
  }
}
