package graft.lakehouse

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row/non-null/distinct counts and
  * min/max — the data-quality summary behind schema review and PK-candidate
  * spotting (the same statistics [[Relationships]] derives internally,
  * exposed as a user-facing operator).
  *
  * Single scan regardless of column count: every column explodes into
  * (column_name, value-as-string, was_null) rows and ONE aggregation
  * computes all profiles — n columns never mean n scans of a 100 TB table.
  * Values are profiled through their canonical string form (min/max are
  * lexicographic for non-numeric display purposes; exact numeric ranges
  * come from [[Relationships]]' typed stats when needed).
  */
object Profile {

  def profileTable(df: DataFrame): DataFrame = {
    val entries = df.schema.fields.map { f =>
      struct(lit(f.name).as("column_name"),
        col(f.name).cast("string").as("v"),
        col(f.name).isNotNull.as("nn"))
    }
    df.select(explode(array(entries.toSeq: _*)).as("e"))
      .select(col("e.column_name").as("column_name"), col("e.v").as("v"),
        col("e.nn").as("nn"))
      .groupBy("column_name").agg(
        count(lit(1)).as("n_rows"),
        count(when(col("nn"), 1)).as("n_nonnull"),
        countDistinct("v").as("n_distinct"),
        min("v").as("min_str"),
        max("v").as("max_str"))
  }
}
