package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lakehouse.{Catalog, TableIO, MatView}

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t0[T](tag: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"[scratch] === pass $pass")
      val lh = Catalog.registerLocalWorkspace(
        "/root/repo/target/scratch_lh" + pass, "ws", "rt").lakehouses.head
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      t0("dropx2") { TableIO.dropTable(spark, lh, "orders_mvx_src"); TableIO.dropTable(spark, lh, "orders_mvx") }
      t0("writeTable src") { TableIO.writeTable(spark, lh, "orders_mvx_src", orders.filter(col("o_orderkey") % 2 === 0)) }
      t0("enableCDF") { TableIO.enableChangeFeed(spark, lh, "orders_mvx_src") }
      t0("createAggView") { MatView.createAggView(spark, lh, "orders_mvx", "orders_mvx_src", Seq("o_custkey"), sumCols = Seq.empty, minCols = Seq("price"), maxCols = Seq("price")) }
      t0("mergeTable") { TableIO.mergeTable(spark, lh, "orders_mvx_src",
        orders.filter(col("o_orderkey") % 3 === 0).withColumn("price", (col("price") * 2).cast("decimal(18,2)")), Seq("o_orderkey")) }
      t0("deleteFrom") { TableIO.deleteFromTable(spark, lh, "orders_mvx_src", "o_orderkey % 5 = 0") }
      t0("refreshAggView") { MatView.refreshAggView(spark, lh, "orders_mvx") }
      t0("final count") { TableIO.selectTable(spark, lh, "orders_mvx").count() }
    }
    spark.stop()
  }
}
