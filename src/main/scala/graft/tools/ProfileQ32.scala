package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: stage-by-stage wall times of the q32 ngram-Jaccard dense
  * plan at sf0.1 (not part of the query registry). */
object ProfileQ32 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val d = time("tokenize+persist") {
        val dd = docs.select(col("doc_id"),
            transform(graft.lakehouse.ext.Dedup.wordNgrams("text", 3),
              g => xxhash64(g)).as("hs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        dd.count(); dd
      }
      val freqAll = time("freq agg") {
        val f = d.select(explode(col("hs")).as("gh"))
          .groupBy("gh").agg(count(lit(1)).as("df_count"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count(); f
      }
      val heavy = time("heavy collect") {
        freqAll.filter(col("df_count") > 20).select("gh").collect()
          .map(_.getLong(0)).toSet
      }
      val bc = spark.sparkContext.broadcast(heavy)
      val surv = {
        val u = udf((hs: Seq[Long]) => {
          val h = bc.value; hs.filter(x => !h.contains(x)).toArray })
        d.select(col("doc_id"), u(col("hs")).as("ts"))
      }
      val tExact = lit(scala.math.BigDecimal("0.5"))
      def leg(base: org.apache.spark.sql.DataFrame) =
        base.select(col("doc_id"), size(col("ts")).as("sz"),
          ceil(size(col("ts")) * tExact).cast("long").as("lb"),
          explode(col("ts")).as("t"))
      val probe = leg(surv.repartition(32, col("doc_id")))
      val build = leg(surv)
      time("dense join") {
        val r = probe.select(col("doc_id").as("a"), col("sz").as("sza"),
            col("lb").as("lba"), col("t"))
          .join(broadcast(build.select(col("doc_id").as("b"),
            col("sz").as("szb"), col("lb").as("lbb"), col("t"))), "t")
          .filter(col("a") < col("b") &&
            col("szb") >= col("lba") && col("sza") >= col("lbb"))
          .groupBy("a", "b", "sza", "szb").agg(count(lit(1)).as("common"))
          .withColumn("jaccard", col("common").cast("double") /
            (col("sza") + col("szb") - col("common")).cast("double"))
          .filter(col("jaccard") >= 0.5)
          .count()
        println(s"[prof] rows: $r")
      }
      // alternative: posting-list pair plan over the same cache
      time("posting plan") {
        val idx = d.select(col("doc_id"), explode(col("hs")).as("gh"))
          .groupBy("gh")
          .agg(count(lit(1)).as("df_count"),
            sort_array(collect_list(col("doc_id"))).as("ids"))
          .filter(col("df_count") <= 20)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sizes = idx.select(explode(col("ids")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val pairs = idx.filter(col("df_count") >= 2)
          .select(explode(expr(
            "flatten(transform(ids, (x, i) -> " +
              "transform(slice(ids, i + 2, size(ids) - i - 1), " +
              "y -> struct(x AS a, y AS b))))")).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
        val r = pairs.groupBy("a", "b").agg(count(lit(1)).as("common"))
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
          .withColumn("jaccard", col("common").cast("double") /
            (col("sza") + col("szb") - col("common")).cast("double"))
          .filter(col("jaccard") >= 0.5)
          .count()
        idx.unpersist()
        println(s"[prof] rows: $r")
      }
      freqAll.unpersist(); d.unpersist()
    }
    spark.stop()
  }
}
