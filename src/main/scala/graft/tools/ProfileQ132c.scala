package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: job-level breakdown of the dense-path q132. Not contract. */
object ProfileQ132c {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lakehouse.ext.Dedup

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"JOB $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    base.count()
    (1 to 3).foreach { pass =>
      println(s"=== pass $pass ===")
      val docs0 = base.filter(col("doc_id") % 10 === 0)
      val copies = docs0.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      val df = docs0.unionByName(copies)
      val out = time("operator (incl ckpt)")(
        Dedup.prefixFilterJaccardPairs(df, "doc_id", "text", 0.85))
      time("orderBy+count")(println("  rows=" + out.orderBy("a", "b").count()))
    }
    spark.stop()
  }
}
