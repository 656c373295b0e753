package graft
import org.apache.spark.sql.SparkSession
/** Dev-only micro-profiler: repeat named queries to separate plan-compile
  * cost from steady-state execution. Not part of the driver contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        Queries.all.find(_.name == name).get.run(spark, dir).count()
        println(f"$name#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
