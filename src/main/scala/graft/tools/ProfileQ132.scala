package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage profiler for q132's prefix-filter Jaccard join.
  * Not part of the driver contract. */
object ProfileQ132 {
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
      println(f"STAGE $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    base.count()

    (1 to 2).foreach { pass =>
      println(s"=== pass $pass ===")
      val docs0 = base.filter(col("doc_id") % 10 === 0)
      val copies = docs0.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      val df = docs0.unionByName(copies)
      val threshold = 0.85

      val toks = df.select(col("doc_id"),
        explode(Dedup.wordNgrams("text", 1)).as("w"))
        .filter(col("w") =!= "")
        .select(col("doc_id"), xxhash64(col("w")).as("t"))
      time("toks count")(println("  toks=" + toks.count()))
      val freq = toks.groupBy("t").agg(count(lit(1)).as("tf"))
      time("freq count")(println("  vocab=" + freq.count()))
      val docs = toks.join(freq, "t")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("tf"), col("t")))).as("ts"))
        .withColumn("plen",
          (size(col("ts")) - ceil(size(col("ts")) *
            lit(scala.math.BigDecimal(java.lang.Double.toString(threshold))))
            + lit(1)).cast("int"))
        .select(col("doc_id"),
          expr("transform(ts, x -> x.t)").as("toks"),
          size(col("ts")).as("sz"),
          expr("transform(filter(slice(ts, 1, plen), x -> x.tf >= 2), " +
            "x -> x.t)").as("ptoks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("docs build+persist")(println("  docs=" + docs.count()))
      val pref = docs.select(col("doc_id"), col("sz"),
        explode(col("ptoks")).as("t"))
      time("pref count")(println("  prefixRows=" + pref.count()))
      val tExact = lit(scala.math.BigDecimal(java.lang.Double.toString(threshold)))
      val candRaw = pref.select(col("doc_id").as("a"), col("sz").as("sza"), col("t"))
        .join(pref.select(col("doc_id").as("b"), col("sz").as("szb"), col("t")), "t")
        .filter(col("a") < col("b") &&
          col("szb") >= ceil(col("sza") * tExact) &&
          col("sza") >= ceil(col("szb") * tExact))
      time("candRaw count")(println("  candRaw=" + candRaw.count()))
      val cand = candRaw.select("a", "b").distinct()
      time("cand distinct")(println("  cand=" + cand.count()))
      val result = cand
        .join(docs.select(col("doc_id").as("a"), col("toks").as("ta"),
          col("sz").as("sza")), "a")
        .join(docs.select(col("doc_id").as("b"), col("toks").as("tb"),
          col("sz").as("szb")), "b")
        .withColumn("common", size(array_intersect(col("ta"), col("tb"))))
        .withColumn("jaccard", col("common").cast("double") /
          (col("sza") + col("szb") - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
      time("verify+result")(println("  result=" + result.count()))
      time("verify rerun")(println("  result=" + result.count()))
      if (pass == 2 && sys.env.contains("PROFILE_EXPLAIN"))
        result.explain("formatted")
      docs.unpersist()
    }
    spark.stop()
  }
}
