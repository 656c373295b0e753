package graft
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: count Spark JOBS per registered query (warm run) — the
  * evidence for action/job-count optimizations that a final-frame
  * `.explain` cannot show (e.g. removing the per-commit staged-file
  * stats re-read). Not part of the driver contract.
  *
  * Usage: runMain graft.JobCount <sfDir> <q1,q2,...>
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val lines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String])
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          lines.add(f"    job ${je.jobId}%4d ${(je.time - s._1) / 1e3}%7.3fs  ${s._2}")
          ()
        }
      }
    })
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobcount] unknown query: $name")
        case Some(fn) =>
          fn(spark, sfDir).count() // warm (codegen, fixture footers)
          Thread.sleep(500)        // drain listener bus
          jobs.set(0)
          lines.clear()
          fn(spark, sfDir).count()
          Thread.sleep(500)
          println(s"[jobcount] $name jobs=${jobs.get()}")
          lines.forEach(println(_))
      }
    }
    spark.stop()
  }
}
