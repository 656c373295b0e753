package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of q279's candidateJaccardHistogram. */
object ProfileQ279 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (i <- 1 to 2) {
      println(s"=== pass $i")
      val bands = graft.lakehouse.ext.Dedup.portableBandKeys(
        df, "doc_id", "text")
      time("bands.count")(bands.count())
      val b2 = bands.persist()
      time("bands.persist.count")(b2.count())
      val l = b2.select(col("doc_id").as("a"), col("band_no"), col("band_key"))
      val r = b2.select(col("doc_id").as("b"), col("band_no"), col("band_key"))
      val pairs = l.join(r, Seq("band_no", "band_key"))
        .filter(col("a") < col("b")).select("a", "b").distinct()
      time("pairs.count")(pairs.count())
      val p2 = pairs.persist()
      time("pairs.persist.count")(p2.count())
      val candDocs = p2.select(col("a").as("doc_id"))
        .unionByName(p2.select(col("b").as("doc_id"))).distinct()
      time("candDocs.count")(candDocs.count())
      val gramSets = df.join(candDocs, Seq("doc_id"), "left_semi")
        .filter(length(col("text")) >= 5)
        .select(col("doc_id"), expr(
          "array_distinct(transform(sequence(1, length(`text`) - 4), " +
            "p -> substring(`text`, p, 5)))").as("gset"))
      val g2 = gramSets.persist()
      time("gramSets.count")(g2.count())
      val joined = p2
        .join(broadcast(g2.select(col("doc_id").as("a"), col("gset").as("ga"))), Seq("a"))
        .join(broadcast(g2.select(col("doc_id").as("b"), col("gset").as("gb"))), Seq("b"))
      time("joined.count")(joined.count())
      val hist = joined
        .select(expr("size(array_intersect(ga, gb))").as("__c"),
          expr("size(ga)").as("__sza"), expr("size(gb)").as("__szb"))
        .select(expr("(__c * 1000) div (__sza + __szb - __c)").as("__jp"))
        .select(expr("cast(__jp div 100 as int)").as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("n_pairs"))
      time("hist.collect")(hist.collect())
      val full = graft.lakehouse.ext.Dedup.candidateJaccardHistogram(
        df, "doc_id", "text")
      time("full")(full.collect())
      b2.unpersist(); p2.unpersist(); g2.unpersist()
    }
    spark.stop()
  }
}
