package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timings for q288's Adamic-Adar pipeline. */
object ProfileQ288 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (i <- 1 to 2) {
      println(s"=== pass $i")
      val edges = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") % 7 === 0)
        .selectExpr("l_partkey * 2 AS src", "l_suppkey * 2 + 1 AS dst")
      val und = edges
        .select(least(col("src"), col("dst")).cast("long").as("a"),
          greatest(col("src"), col("dst")).cast("long").as("b"))
        .filter(col("a") =!= col("b") && col("a").isNotNull)
        .distinct().persist()
      time("und.count")(und.count())
      val sym = und.select(explode(array(
          struct(col("a").as("w"), col("b").as("n")),
          struct(col("b").as("w"), col("a").as("n")))).as("e"))
        .select(col("e.w").as("w"), col("e.n").as("n"))
      val adj = sym.groupBy("w")
        .agg(sort_array(collect_list(col("n"))).as("nbrs"))
        .filter(size(col("nbrs")).between(2, 1024))
        .withColumn("term",
          floor(lit(1e12) / log(size(col("nbrs")).cast("double")))
            .cast("long")).persist()
      time("adj.count")(adj.count())
      val scored = graft.lakehouse.ext.Graph.adamicAdarPairs(und, 1024)
      time("scored.count")(scored.count())
      time("top50")(scored
        .orderBy(col("score_scaled").desc, col("u").asc, col("v").asc)
        .limit(50).collect())
      und.unpersist(); adj.unpersist()
    }
    spark.stop()
  }
}
