package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library's query entry point: register N DataFrames as N named temp
  * views, run one SQL statement over them — Catalyst does
  * parse → analyze → optimize → execute.
  *
  * Reference: ecu/sbl/aace/datalake/common.py:172-205 (sqlQueryDataFrame).
  * The reference's printSQL timings measure only lazy plan construction
  * (DataFrames are lazy); kept for parity of the debugging surface.
  */
object QueryApi {

  def sqlQueryDataFrame(
      spark: SparkSession,
      dfs: Seq[DataFrame],
      tempTableNames: Seq[String],
      qrySql: String,
      printSQL: Boolean = false): DataFrame = {
    require(dfs.length == tempTableNames.length,
      s"sqlQueryDataFrame: ${dfs.length} DataFrames vs ${tempTableNames.length} names")
    val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    dfs.zip(tempTableNames).foreach { case (df, name) =>
      val t0 = System.nanoTime()
      df.createOrReplaceTempView(name)
      timings += name -> (System.nanoTime() - t0) / 1e9
    }
    if (printSQL) println(qrySql)
    val t0 = System.nanoTime()
    val out = spark.sql(qrySql)
    timings += "Query" -> (System.nanoTime() - t0) / 1e9
    if (printSQL) {
      val pad = (5 +: tempTableNames.map(_.length)).max
      timings.foreach { case (n, s) => println(f"\t${n.padTo(pad, ' ')} : $s%5.2fs") }
    }
    out
  }

  /** Single-DataFrame convenience overload. */
  def sqlQueryDataFrame(spark: SparkSession, df: DataFrame, tempTableName: String,
      qrySql: String): DataFrame =
    sqlQueryDataFrame(spark, Seq(df), Seq(tempTableName), qrySql)
}
