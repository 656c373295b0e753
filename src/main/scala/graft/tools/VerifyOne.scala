package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run a subset of registry queries through the Verify dump
  * (result parquet + oracle_sql.json) so tools/check_oracle.py can gate a
  * single new query without replaying all of them. Args: sfDir outDir
  * queryName... */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <name>...")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"VERIFYONE $n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => names.contains(k) }
      .map { case (k, v) =>
        val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\t", "\\t")
        s""""$k": "$esc""""
      }.mkString("{", ",\n", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
