package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark main. Prints ONE JSON line (the driver contract) and
  * also writes it to target/bench.json so the driver can parse it without
  * scraping sbt log prefixes. The session is warmed (codegen JIT, parquet
  * footer machinery, shuffle paths) before any query is timed — otherwise
  * whichever query runs first absorbs ~5 s of one-time setup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // default codegen cache holds 100 fragments; 55 queries x ~10
      // fragments evicts constantly, re-paying Janino compilation
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise scan, aggregate, join, window and UDF codepaths once,
    // and touch every fixture table's footer/file-index so no measured query
    // absorbs another table's one-time open cost.
    {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.groupBy("r_regionkey").count().collect()
      r.join(r.select(col("r_regionkey")), "r_regionkey").count()
      spark.range(1000).selectExpr(
        "row_number() over (partition by id % 7 order by id) as rn").count()
      // ANN/vector machinery: the custom dot/cosine expressions, HOF
      // transform, hyperplane bucketing, broadcast join and window rank
      // cost ~5 s of one-time codegen the first time ANY of them runs —
      // absorb it here instead of inside whichever ANN query goes first
      locally {
        val e = spark.range(64).selectExpr("id as vec_id",
          "transform(sequence(1, 8), x -> cast(x as double)) as embedding")
        graft.lakehouse.ext.Similarity.lshTopK(e,
          e.filter(col("vec_id") < 2), "vec_id", "embedding",
          k = 2, numPlanes = 4, dim = 8).count()
      }
      val dir = java.nio.file.Paths.get(sfDir)
      val files = java.nio.file.Files.list(dir)
      try files.iterator().forEachRemaining { p =>
        if (p.toString.endsWith(".parquet"))
          try spark.read.parquet(p.toString).count()
          catch { case _: Throwable => () } // nano-ts tables need readParquetNanoTs
      } finally files.close()
      // seed the memoized lakehouse: catalog queries measure reads, not the
      // one-time fixture load (the oracle reads the raw parquet directly)
      QFixtures.mainLakehouse(spark, sfDir)
    }

    // Two timed passes per query. The first pass pays one-time plan
    // compilation (Janino/whole-stage codegen) on top of execution; the
    // second hits Spark's codegen cache and measures steady-state execution
    // — what a long-lived cluster session sees. Both totals are reported;
    // "value" is the steady-state total, cold_total keeps the one-shot
    // number honest.
    // A crashed query is recorded as -1.0 (sentinel), never as its
    // fast-failing wall time — otherwise failures masquerade as wins in the
    // totals (round 4's 17 crashed queries looked like ~0.06 s timings).
    def timedPass(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    // Host-speed calibration anchor: one deterministic CPU-bound job
    // (hash-reduce 50M longs), timed AFTER warmup. Rounds run on boxes
    // of very different speed/noise (round 9 measured ~2-3x vs round
    // 8 on identical code); cross-round per-query ratios are only
    // interpretable relative to this anchor.
    val calib = {
      val t0 = System.nanoTime()
      spark.range(50000000L)
        .select(expr("bit_xor(xxhash64(id))")).head()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = timedPass()
    val warm = timedPass()
    val failedNames = warm.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val qs = warm.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = warm.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    // Short totals-only line LAST: the driver captures a bounded TAIL of
    // stdout, so whatever prints last survives truncation. The ~2 KB
    // per-query line goes first (informative when the tail is large
    // enough); the short line goes last so the round total always parses.
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val shortLine =
      s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"calib_sec":$calib,"sf":"$sfDir","bench_failures":$failedJson}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"calib_sec":$calib,"sf":"$sfDir","bench_failures":$failedJson,"queries":$qs}"""
    println(line)
    println(shortLine)
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, line + "\n")
    } catch { case _: Throwable => () } // file write is best-effort
    spark.stop()
  }
}
