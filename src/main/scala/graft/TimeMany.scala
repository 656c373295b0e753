package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr
import java.nio.file.{Files, Paths}

/** Dev tool: steady-state medians for a set of registered queries — the
  * per-round `TIMEONE_r{N}.json` snapshot. The in-bench per-query times
  * in the 400+-query Bench JVM read 2-4x above steady state (JIT/codegen
  * cache churn), so `tools/bench_diff.py` prefers this file's medians
  * when present. Run on an IDLE box.
  *
  * Usage: runMain graft.TimeMany <sfDir> <outFile> <q1,q2,...> [passes]
  * Emits {"sf":..., "calib_sec":..., "passes":N, "medians":{q:sec}}.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val passes = args.lift(3).map(_.toInt).getOrElse(3)
    require(passes >= 1 && names.nonEmpty, "TimeMany: passes>=1, queries nonempty")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench host-speed anchor (hash-reduce 50M longs), after warmup
    spark.range(50000000L).select(expr("bit_xor(xxhash64(id))")).head()
    val calib = {
      val t0 = System.nanoTime()
      spark.range(50000000L).select(expr("bit_xor(xxhash64(id))")).head()
      (System.nanoTime() - t0) / 1e9
    }
    val medians = names.flatMap { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[timemany] unknown query: $name"); None
        case Some(fn) =>
          // one untimed warm pass, then `passes` timed passes
          try {
            fn(spark, sfDir).count()
            val ts = (1 to passes).map { _ =>
              val t0 = System.nanoTime()
              fn(spark, sfDir).count()
              (System.nanoTime() - t0) / 1e9
            }.sorted
            val med = ts(ts.size / 2)
            println(f"[timemany] $name median=$med%.3f all=${
              ts.map(t => f"$t%.2f").mkString(",")}")
            Some(name -> med)
          } catch { case e: Throwable =>
            System.err.println(s"[timemany] $name failed: ${e.getMessage}")
            None
          }
      }
    }
    val qs = medians.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val json = s"""{"sf":"$sfDir","calib_sec":$calib,"passes":$passes,"medians":$qs}"""
    Files.writeString(Paths.get(outFile), json)
    println(json.take(200))
    spark.stop()
  }
}
