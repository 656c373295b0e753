package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session bootstrap + notebook-shim surface of the reference.
  * Reference: ecu/sbl/aace/datalake/common.py:85-122 (APPNAME_DEFAULT,
  * module-level `spark`, sparkSession()), common.py:98-109 (Display),
  * common.py:398-436 (extract_actual_error / display_exception).
  */
object Session {

  val AppNameDefault = "graft-lakehouse"

  /** common.py:111-122 — build-or-get the session. Unlike the reference's
    * import-time global, this is an explicit call; defaults are tuned for
    * the harness box (local[32]) but every knob is overridable and the
    * builder is a no-op when a session already exists (getOrCreate).
    * On a real cluster, master/shuffle-partitions come from spark-submit
    * and the cluster manager — only the semantic confs below matter. */
  def sparkSession(
      appName: String = AppNameDefault,
      master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce post-shuffle partitions even when the plan is
      // persisted — cached frames otherwise keep the static partition count
      // and small cached aggregates schedule hundreds of near-empty tasks
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // the 100-entry default evicts constantly on many-query sessions,
      // re-paying Janino compilation per fragment
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Strings.registerUdfs(s)
    graft.lakehouse.ext.TextStats.registerUdfs(s)
    graft.lakehouse.functions.VectorFunctions.register(s)
    s
  }

  /** common.py:98-109 — notebook display shim: DataFrame → tabular show,
    * anything else → println. Dev/debug tool only; never in a hot path. */
  def display(x: Any, truncate: Boolean = true): Unit = x match {
    case df: DataFrame => df.show(20, truncate)
    case m: Map[_, _] => m.foreach { case (k, v) => println(s"$k\t$v") }
    case it: Iterable[_] => it.foreach(println)
    case other => println(other)
  }

  /** common.py:398-410 — pull the actionable root-cause message out of a
    * (possibly deeply nested) failure. */
  def extractActualError(t: Throwable): String =
    TableIO.rootCause(t).getMessage

  /** common.py:419-436 — log the prettified failure, optionally rethrow. */
  def displayException(t: Throwable, reraise: Boolean = true): Unit = {
    System.err.println(s"[graft] ${t.getClass.getSimpleName}: ${extractActualError(t)}")
    if (reraise) throw t
  }
}
