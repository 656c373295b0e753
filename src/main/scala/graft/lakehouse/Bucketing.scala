package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) tables via Spark's native bucketing: both
  * sides of a recurring equi-join are written pre-hash-partitioned into the
  * same bucket count on the join key, so the join (and any later groupBy on
  * that key) runs with ZERO exchange — the single biggest shuffle saving
  * available for a 100 TB fact⋈fact join that no broadcast can absorb.
  * The bucket spec lives in the session catalog (`saveAsTable`), which is
  * what lets the planner prove `HashPartitioning(key, n)` on both scans.
  */
object Bucketing {

  /** Idempotently create `db` at an explicit filesystem location (keeps
    * bucketed fixtures out of the default warehouse dir). */
  def ensureDatabase(spark: SparkSession, db: String, location: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db` LOCATION '$location'")

  /** Write `df` as a parquet table bucketed (and sorted) by `bucketCols`
    * into `nBuckets` hash buckets. Overwrites any previous version. Each
    * task writes one file per bucket it holds data for — repartition on
    * the bucket key first when the input has many small tasks, or the
    * file count explodes to tasks × buckets. */
  def writeBucketed(spark: SparkSession, db: String, table: String,
      df: DataFrame, nBuckets: Int, bucketCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    // a managed table's files outlive an in-memory catalog (new JVM, same
    // target dir) and saveAsTable refuses to adopt an existing location —
    // drop the catalog entry and clear any stale directory first
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val dbUri = java.net.URI.create(spark.catalog.getDatabase(db).locationUri)
    val dbDir = if (dbUri.getScheme == null) new java.io.File(dbUri.toString)
      else new java.io.File(dbUri)
    val loc = new java.io.File(dbDir, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(s"`$db`.`$table`")
  }

  def table(spark: SparkSession, db: String, name: String): DataFrame =
    spark.table(s"`$db`.`$name`")
}
