package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, expr, lit}

import graft.lakehouse.{LakehouseProps, TableIO}

/** Right-to-be-forgotten erasure across a set of versioned tables, with
  * the audit trail compliance wants: per-table rows before, rows
  * deleted, rows after, and a POST-erasure residual re-count of the
  * predicate (a figure the deletion path itself cannot fabricate,
  * because it re-scans the committed table).
  *
  * Built on the lakehouse's row-level DELETE (`TableIO.deleteFromTable`,
  * `common.py:512-517`'s intended drop semantics generalized to
  * predicates): each table's erasure is one O(touched-files) versioned
  * commit — untouched files are never rewritten, time travel preserves
  * the pre-erasure versions for the retention window, and VACUUM later
  * makes the physical bytes unrecoverable. The table loop is driver-side
  * over a HANDFUL of table names (the q157 multi-table pattern); every
  * count and delete inside it is a distributed action.
  */
object Erasure {

  /** Apply `condition` as a row-level DELETE to each named table and
    * return the per-table audit report, one row per table in input
    * order. */
  def eraseWhere(spark: SparkSession, lh: LakehouseProps,
      targets: Seq[(String, String)]): DataFrame = {
    require(targets.nonEmpty, "eraseWhere needs at least one target table")
    def eraseOne(tbl: String, cond: String): (String, Long, Long, Long, Long) = {
      // before/after row counts come from the manifest's per-file counts
      // when available (exact by construction — the same numbers a
      // count(*) scan returns, O(0) instead of a table scan per figure);
      // the RESIDUAL figure deliberately stays a real re-scan of the
      // committed table — that is the audit's whole point.
      def rowCount(): Long = TableIO.tableRowCount(lh, tbl)
        .getOrElse(TableIO.selectTable(spark, lh, tbl).count())
      val before = rowCount()
      TableIO.deleteFromTable(spark, lh, tbl, cond)
      val after = rowCount()
      val residual = TableIO.selectTable(spark, lh, tbl)
        .filter(coalesce(expr(cond), lit(false))).count()
      (tbl, before, before - after, after, residual)
    }
    // DISTINCT tables are independent commit chains (disjoint table dirs):
    // run their erasures from a small driver pool so one table's commit
    // tail back-fills with the next table's scan (optimization guide §2.6
    // — actions are only sequential because the driver calls them
    // sequentially). Repeated tables keep the sequential path: their
    // deletes would race the same commit log. Report rows keep INPUT
    // order either way, so results are identical.
    val rows: Seq[(String, Long, Long, Long, Long)] =
      if (targets.size < 2 ||
          targets.map(_._1).distinct.size != targets.size)
        targets.map { case (tbl, cond) => eraseOne(tbl, cond) }
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(3, targets.size))
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        try {
          val futs = targets.map { case (tbl, cond) =>
            Future(eraseOne(tbl, cond))
          }
          futs.map(Await.result(_, Duration.Inf))
        } finally pool.shutdown()
      }
    import spark.implicits._
    rows.toDF("table_name", "rows_before", "rows_deleted", "rows_after",
      "residual_rows")
  }
}
