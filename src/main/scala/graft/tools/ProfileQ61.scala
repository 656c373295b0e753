package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Dev harness: per-job wall times of a registered query (default q61). */
object ProfileQ61 {
  def main(args: Array[String]): Unit = {
    val name = args.lift(0).getOrElse("q61_bm25_topk")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(je.jobId, 0L)
        println(f"[job] ${je.jobId}: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    })
    if (args.lift(2).contains("noaqe"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val fn = graft.SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      println(s"--- pass $i ---")
      val n = fn(spark, sfDir).count()
      println(f"[prof] total pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
