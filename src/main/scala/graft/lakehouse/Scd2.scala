package graft.lakehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing dimension built from the row-level change feed
  * ([[TableIO.readChangeFeed]]): every key's attribute history becomes
  * validity intervals `[valid_from, valid_to)` in commit-version time, the
  * current row's interval open (null valid_to). The classic warehouse
  * dimension-history pattern (Kimball SCD type 2), derived in O(changes):
  * the dimension table itself is never rescanned, and a single shuffle on
  * the key feeds the interval window — at 100 TB the cost tracks the
  * change volume, not the dimension size.
  *
  * Feed semantics consumed: `insert` / `update_postimage` OPEN an interval
  * at their commit version; `update_preimage` / `delete` CLOSE the key's
  * most recent interval opened strictly before their version. An update's
  * preimage+postimage pair at one version therefore closes the old row and
  * opens the new one seamlessly, and a delete→reinsert leaves a gap.
  */
object Scd2 {
  def fromChangeFeed(feed: DataFrame, keyCols: Seq[String]): DataFrame = {
    val attrCols = feed.columns.filterNot(c =>
      keyCols.contains(c) || c == "_change_type" || c == "_commit_version")
    val opener = col("_change_type").isin("insert", "update_postimage")
    // closers sort BEFORE openers at the same version: a same-version
    // closer belongs to the previous interval (update pre/post pair)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version"), opener.cast("int"))
      .rowsBetween(1, Window.unboundedFollowing)
    feed
      .withColumn("__closer_v",
        min(when(!opener, col("_commit_version"))).over(w))
      .where(opener)
      .select(keyCols.map(col) ++ attrCols.map(col) :+
        col("_commit_version").as("valid_from") :+
        col("__closer_v").as("valid_to") :+
        col("__closer_v").isNull.as("is_current"): _*)
  }
}
