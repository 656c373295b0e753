package graft.lakehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling: per-column row/non-null/distinct counts and
  * min/max — the data-quality summary behind schema review and PK-candidate
  * spotting (the same statistics [[Relationships]] derives internally,
  * exposed as a user-facing operator).
  *
  * Single scan regardless of column count: every column explodes into
  * (column_name, value-as-string, numeric-slot, was_null) rows and ONE
  * aggregation computes all profiles — n columns never mean n scans of a
  * 100 TB table.
  *
  * Min/max are TYPED: orderable non-string types (numerics, decimals,
  * dates, timestamps, booleans) ride a numeric ordering slot and
  * `min_by`/`max_by` pick the value at the typed extreme — an int column
  * reports max "24", not the lexicographic "9". String (and other) columns
  * order lexicographically as before. The reported value is always the
  * column's own canonical string rendering. */
object Profile {

  /** A double that orders `f` correctly, or null for lexicographic types.
    * Timestamps/dates map to epoch seconds/days; 64-bit longs above 2^53
    * lose sub-ulp ordering precision — acceptable for a profile summary
    * (exact key analytics live in [[Relationships]]' typed slots). */
  private def orderingSlot(f: StructField) = f.dataType match {
    case _: NumericType => col(f.name).cast("double")
    case BooleanType => col(f.name).cast("int").cast("double")
    case DateType | TimestampType | TimestampNTZType =>
      col(f.name).cast("timestamp").cast("double")
    case _ => lit(null).cast("double")
  }

  def profileTable(df: DataFrame): DataFrame = {
    val entries = df.schema.fields.map { f =>
      struct(lit(f.name).as("column_name"),
        col(f.name).cast("string").as("v"),
        orderingSlot(f).as("ord"),
        col(f.name).isNotNull.as("nn"))
    }
    df.select(explode(array(entries.toSeq: _*)).as("e"))
      .select(col("e.column_name").as("column_name"), col("e.v").as("v"),
        col("e.ord").as("ord"), col("e.nn").as("nn"))
      .groupBy("column_name").agg(
        count(lit(1)).as("n_rows"),
        count(when(col("nn"), 1)).as("n_nonnull"),
        countDistinct("v").as("n_distinct"),
        // typed extreme when the ordering slot exists (min_by/max_by skip
        // null-ordering rows, so they return null for lexicographic
        // columns and coalesce falls through to the string ordering)
        coalesce(min_by(col("v"), col("ord")), min("v")).as("min_str"),
        coalesce(max_by(col("v"), col("ord")), max("v")).as("max_str"))
  }
}
