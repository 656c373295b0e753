package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only profiler for the pair-generation queries (q32/q132): runs the
  * named registry queries a few times at SPARK_GRAFT_SF_DIR and prints
  * per-pass timings + formatted plans. Not part of the driver contract. */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q32_dedup_ngram_jaccard", "q132_prefix_jaccard_join")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the scan/agg/join machinery once
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        println(f"PROFILE $n pass=$pass rows=$cnt time=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      if (sys.env.contains("PROFILE_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
