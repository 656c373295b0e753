package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only profiler for the dense Jaccard plan. Not driver contract. */
object ProfileQ132b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lakehouse.ext.Dedup

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    base.count()
    val threshold = 0.85
    val tExact = lit(scala.math.BigDecimal(java.lang.Double.toString(threshold)))

    (1 to 3).foreach { pass =>
      println(s"=== pass $pass ===")
      val docs0 = base.filter(col("doc_id") % 10 === 0)
      val copies = docs0.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      val df = docs0.unionByName(copies)
      time("dispatch count")(println("  n=" + df.count()))
      val d = df.select(col("doc_id"), Dedup.wordNgrams("text", 1).as("ws"))
        .select(col("doc_id"), expr("filter(ws, w -> w <> '')").as("ws"))
      val ex = d.select(col("doc_id"), size(col("ws")).as("sz"),
          explode(col("ws")).as("w"))
        .select(col("doc_id"), col("sz"), xxhash64(col("w")).as("t"))
      val joined = ex.select(col("doc_id").as("a"), col("sz").as("sza"), col("t"))
        .join(ex.select(col("doc_id").as("b"), col("sz").as("szb"), col("t")), "t")
        .filter(col("a") < col("b") &&
          col("szb") >= ceil(col("sza") * tExact) &&
          col("sza") >= ceil(col("szb") * tExact))
      time("joined count")(println("  joined=" + joined.count()))
      val res = joined
        .groupBy("a", "b", "sza", "szb").agg(count(lit(1)).as("common"))
        .withColumn("jaccard", col("common").cast("double") /
          (col("sza") + col("szb") - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
      time("full dense")(println("  res=" + res.count()))
      time("with orderBy")(println("  res=" + res.orderBy("a", "b").count()))

      // variant B: precomputed long bounds + broadcast-hinted build leg
      val par = spark.sparkContext.defaultParallelism
      val ex2 = d.repartition(par, col("doc_id"))
        .select(col("doc_id"), size(col("ws")).as("sz"),
          explode(col("ws")).as("w"))
        .select(col("doc_id"), col("sz"),
          ceil(col("sz") * tExact).cast("long").as("lb"),
          xxhash64(col("w")).as("t"))
      val left2 = ex2.select(col("doc_id").as("a"), col("sz").as("sza"),
        col("lb").as("lba"), col("t"))
      val right2 = ex2.select(col("doc_id").as("b"), col("sz").as("szb"),
        col("lb").as("lbb"), col("t"))
      val res2 = left2.join(broadcast(right2), "t")
        .filter(col("a") < col("b") &&
          col("szb") >= col("lba") && col("sza") >= col("lbb"))
        .groupBy("a", "b", "sza", "szb").agg(count(lit(1)).as("common"))
        .withColumn("jaccard", col("common").cast("double") /
          (col("sza") + col("szb") - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
      time("variantB dense")(println("  res2=" + res2.count()))
      time("variantB orderBy")(println("  res2=" + res2.orderBy("a", "b").count()))
    }
    spark.stop()
  }
}
