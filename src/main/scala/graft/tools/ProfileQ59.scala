package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: stage-by-stage wall times of the q59 tfidf kernel plan. */
object ProfileQ59 {
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
    val toksCol = filter(
      split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "),
      t => length(t) > 0)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val numP = time("getNumPartitions")(docs.rdd.getNumPartitions)
      println(s"[prof] partitions: $numP")
      val d = time("spread+tokenize+persist") {
        val dd = docs.repartition(32)
          .select(col("doc_id"), toksCol.as("toks"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        dd.count(); dd
      }
      val dfT = time("dfT agg+collect") {
        d.select(when(size(col("toks")) > 0,
              concat(array(lit(" ")), array_distinct(col("toks"))))
            .otherwise(array().cast("array<string>")).as("dts"))
          .select(explode(col("dts")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("df_t"))
          .collect()
      }
      println(s"[prof] vocab: ${dfT.length}")
      var nDocs = 0L
      val m = new java.util.HashMap[String, Long](dfT.length * 2)
      dfT.foreach { r =>
        val t = r.getString(0)
        if (t == " ") nDocs = r.getLong(1) else m.put(t, r.getLong(1))
      }
      val bc = spark.sparkContext.broadcast(m)
      val n = nDocs
      val topUdf = udf((toks: Seq[String]) => {
        if (toks == null || toks.isEmpty) Array.empty[graft.lakehouse.ext.TfIdfTerm]
        else {
          val counts = new java.util.HashMap[String, Int]
          toks.foreach(t => counts.put(t, counts.getOrDefault(t, 0) + 1))
          val mm = bc.value
          val scored = new Array[graft.lakehouse.ext.TfIdfTerm](counts.size)
          var i = 0
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val s = e.getValue.toDouble *
              (math.log((n + 1.0) / (mm.getOrDefault(e.getKey, 0L) + 1.0)) + 1.0)
            scored(i) = graft.lakehouse.ext.TfIdfTerm(e.getKey, s)
            i += 1
          }
          java.util.Arrays.sort(scored,
            new java.util.Comparator[graft.lakehouse.ext.TfIdfTerm] {
              def compare(a: graft.lakehouse.ext.TfIdfTerm,
                  b: graft.lakehouse.ext.TfIdfTerm): Int = {
                val c = java.lang.Double.compare(b.score, a.score)
                if (c != 0) c else a.term.compareTo(b.term)
              }
            })
          scored.take(3)
        }
      })
      time("score+explode count") {
        val r = d.select(col("doc_id"),
            posexplode(topUdf(col("toks"))).as(Seq("p", "ts")))
          .select(col("doc_id"), col("ts.term"), (col("p") + 1).as("rank"),
            col("ts.score"))
          .count()
        println(s"[prof] rows: $r")
      }
      time("score+explode checkpoint") {
        d.select(col("doc_id"),
            posexplode(topUdf(col("toks"))).as(Seq("p", "ts")))
          .select(col("doc_id"), col("ts.term"), (col("p") + 1).as("rank"),
            col("ts.score"))
          .localCheckpoint(true)
      }
      d.unpersist()
    }
    spark.stop()
  }
}
