package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lakehouse._

/** One registered query: the Spark-side implementation + (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same parquet
  * tables. Column names/aliases must match between the two (the driver's
  * compare sorts columns by name before hashing).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared fixture/lakehouse plumbing for the query registry. */
object QFixtures {
  /** Load a driver-generated fixture table (TESTDATA.md layout). */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private val lakehouses = scala.collection.mutable.HashMap.empty[String, LakehouseProps]

  /** Memoized local lakehouse seeded (once per JVM per sfDir) with a fixed
    * set of fixture tables, so catalog-path operators (selectTable,
    * readTable, getTables, writeTable) are exercised end-to-end. */
  def mainLakehouse(spark: SparkSession, sfDir: String): LakehouseProps = synchronized {
    lakehouses.getOrElseUpdate(s"main:$sfDir", {
      val sfName = new java.io.File(sfDir).getName
      val ws = Catalog.registerLocalWorkspace(
        s"/root/repo/target/graft_lh/$sfName", s"ws_$sfName", "main")
      val lh = ws.lakehouses.head
      Seq("customer", "orders", "nation", "part", "region").foreach { n =>
        TableIO.writeTable(spark, lh, n, t(spark, sfDir, n))
      }
      lh
    })
  }

  /** Separate lakehouse for the write-roundtrip query (keeps getTables on
    * the main lakehouse deterministic). */
  def rtLakehouse(spark: SparkSession, sfDir: String): LakehouseProps = synchronized {
    lakehouses.getOrElseUpdate(s"rt:$sfDir", {
      val sfName = new java.io.File(sfDir).getName
      Catalog.registerLocalWorkspace(
        s"/root/repo/target/graft_lh_rt/$sfName", s"wsrt_$sfName", "rt")
        .lakehouses.head
    })
  }
}

/** The operator-inventory query registry (SURVEY.md §2). Grows every round;
  * SparkEntry exposes it to the driver harness. */
object Queries {
  import QFixtures._

  val all: Seq[Q] = Seq(

    // ---- §2.2 query entry / SQL execution ----------------------------------
    // Aggregates over doubles are summed in exact DECIMAL then cast back to
    // DOUBLE: the result is bit-identical across Spark and DuckDB (a plain
    // double sum is order-dependent and would flake the oracle hash).
    Q("q1_pricing_summary",
      (s, dir) => QueryApi.sqlQueryDataFrame(s, t(s, dir, "lineitem"), "lineitem",
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          |    AS sum_disc_price,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
          |  count(*)                                                    AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*)                                                    AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q2_sql_multi_view_join",
      (s, dir) => QueryApi.sqlQueryDataFrame(s,
        Seq(t(s, dir, "orders"), t(s, dir, "customer")), Seq("o_v", "c_v"),
        """SELECT c_v.c_mktsegment,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_v.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
          |FROM o_v JOIN c_v ON o_v.o_custkey = c_v.c_custkey
          |GROUP BY c_v.c_mktsegment
          |ORDER BY c_v.c_mktsegment""".stripMargin),
      Some("""SELECT c.c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin)),

    // ---- §2.1 scans / catalog ---------------------------------------------
    Q("q3_select_table",
      (s, dir) => TableIO.selectTable(s, mainLakehouse(s, dir), "customer",
        Some("""SELECT t.c_custkey, t.c_name, t.c_acctbal FROM {table} t
          |WHERE t.c_acctbal > 0 ORDER BY t.c_custkey""".stripMargin)),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin)),

    Q("q4_read_table",
      (s, dir) => TableIO.readTable(s, mainLakehouse(s, dir), "orders",
        Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
        "o_totalprice > 150000").orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_totalprice > 150000 ORDER BY o_orderkey""".stripMargin)),

    Q("q5_get_cols_distinct",
      (s, dir) => TableIO.getColsFromTable(s, mainLakehouse(s, dir), "customer",
        Seq("c_mktsegment"), distinct = true).orderBy("c_mktsegment"),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    Q("q6_write_read_roundtrip",
      (s, dir) => {
        val lh = rtLakehouse(s, dir)
        TableIO.writeTable(s, lh, "part_rt", t(s, dir, "part"))
        TableIO.selectTable(s, lh, "part_rt").orderBy("p_partkey")
      },
      Some("SELECT * FROM part ORDER BY p_partkey")),

    Q("q7_get_tables",
      (s, dir) => {
        val lh = mainLakehouse(s, dir)
        val names = Catalog.getTables(lh)
        import s.implicits._
        names.toDF("table_name").orderBy("table_name")
      },
      Some("""SELECT * FROM (VALUES ('customer'),('nation'),('orders'),('part'),('region'))
        |AS t(table_name) ORDER BY table_name""".stripMargin)),

    // ---- §2.5 / §2.7 distinct+index, casts, null handling -----------------
    Q("q8_distinct_index_counts",
      (s, dir) => Transform.getDistinctValsFromDataRowsInt(
        t(s, dir, "customer"), Seq("c_mktsegment"), rowCountCol = Some("c_custkey")),
      Some("""SELECT row_number() OVER (ORDER BY c_mktsegment) AS indexcmktsegment,
        |  c_mktsegment, count(c_custkey) AS c_custkey
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q9_distinct_index_plain",
      (s, dir) => Transform.getDistinctValsFromDataRowsInt(
        t(s, dir, "orders"), Seq("o_orderpriority", "o_orderstatus")),
      Some("""SELECT row_number() OVER (ORDER BY o_orderpriority, o_orderstatus)
        |    AS indexoorderpriorityoorderstatus,
        |  o_orderpriority, o_orderstatus
        |FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)),

    // l_quantity is integral-valued (1.0..50.0) so Spark's truncating
    // double->int cast and DuckDB's rounding cast agree.
    Q("q10_cast_columns_int",
      (s, dir) => Transform.castColumnsToInt(
        t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_quantity")).orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS INTEGER) AS l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q11_set_text_when_null",
      (s, dir) => Transform.setDFTextWhenNull(
        t(s, dir, "orders").select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderpriority"))
            .as("o_orderpriority")),
        "o_orderpriority", "None Supplied").orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'None Supplied' ELSE o_orderpriority END
        |    AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q12_set_null_to_zero",
      (s, dir) => Transform.setNullToZero(
        t(s, dir, "customer").select(col("c_custkey"),
          when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_acctbal"))
            .as("c_acctbal")),
        Seq("c_acctbal", "no_such_column")).orderBy("c_custkey"),
      Some("""SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN 0 ELSE c_acctbal END AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("q13_create_extra_row",
      (s, dir) => Transform.createExtraRow(t(s, dir, "region"), -1, "NONE"),
      Some("""SELECT * FROM (SELECT * FROM region UNION ALL SELECT -1, 'NONE')
        |ORDER BY r_regionkey""".stripMargin)),

    Q("q14_rename_prefix",
      (s, dir) => Transform.renameColumnsWithPrefix(t(s, dir, "nation"), "dim")
        .orderBy("dim_n_nationkey"),
      Some("""SELECT n_nationkey AS dim_n_nationkey, n_name AS dim_n_name,
        |  n_regionkey AS dim_n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin)),

    Q("q15_rename_strip_prefix",
      (s, dir) => Transform.renameColumnsStripPrefix(
        Transform.renameColumnsWithPrefix(t(s, dir, "nation"), "dim"), Seq("dim"))
        .orderBy("n_nationkey"),
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    Q("q16_add_index_contiguous",
      (s, dir) => Transform.addIndexColContiguous(
        t(s, dir, "nation").orderBy("n_name"), "idx").orderBy("idx"),
      Some("""SELECT row_number() OVER (ORDER BY n_name) AS idx,
        |  n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY idx""".stripMargin)),

    // ---- §2.4 joins --------------------------------------------------------
    Q("q17_simple_map",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val map = Transform.getDistinctValsFromDataRowsInt(customer, Seq("c_mktsegment"))
        Joins.simpleMap(customer, map, "c_mktsegment").orderBy("c_custkey")
      },
      Some("""WITH m AS (
        |  SELECT row_number() OVER (ORDER BY c_mktsegment) AS indexcmktsegment,
        |    c_mktsegment
        |  FROM (SELECT DISTINCT c_mktsegment FROM customer))
        |SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
        |  m.indexcmktsegment, c.c_mktsegment
        |FROM customer c JOIN m ON c.c_mktsegment IS NOT DISTINCT FROM m.c_mktsegment
        |ORDER BY c.c_custkey""".stripMargin)),

    Q("q18_simple_map_null_safe",
      (s, dir) => {
        val fact = t(s, dir, "orders").select(col("o_orderkey"),
          when(col("o_orderkey") % 11 === 0, lit(null)).otherwise(col("o_custkey"))
            .as("o_custkey"),
          col("o_totalprice"))
        val map = Transform.getDistinctValsFromDataRowsInt(fact, Seq("o_custkey"))
        Joins.simpleMap(fact, map, "o_custkey").orderBy("o_orderkey")
      },
      Some("""WITH f AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
        |    o_totalprice
        |  FROM orders),
        |m AS (
        |  SELECT row_number() OVER (ORDER BY o_custkey NULLS FIRST) AS indexocustkey,
        |    o_custkey
        |  FROM (SELECT DISTINCT o_custkey FROM f))
        |SELECT f.o_orderkey, m.indexocustkey, f.o_totalprice, f.o_custkey
        |FROM f JOIN m ON f.o_custkey IS NOT DISTINCT FROM m.o_custkey
        |ORDER BY f.o_orderkey""".stripMargin)),

    // ---- §2.8 scalar / string functions -----------------------------------
    Q("q19_garbage_clo",
      (s, dir) => t(s, dir, "customer").select(col("c_custkey"),
        when(col("c_custkey") % 13 === 0, lit(" N/A "))
          .when(col("c_custkey") % 17 === 0, lit(null))
          .otherwise(col("c_mktsegment")).as("v"))
        .withColumn("is_garbage", Strings.garbageCLOCol(col("v")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, v, (v IS NULL OR v = '' OR lower(trim(v)) = 'n/a')
        |    AS is_garbage
        |FROM (SELECT c_custkey,
        |  CASE WHEN c_custkey % 13 = 0 THEN ' N/A '
        |       WHEN c_custkey % 17 = 0 THEN NULL
        |       ELSE c_mktsegment END AS v FROM customer)
        |ORDER BY c_custkey""".stripMargin)),

    // Scala-UDF surface: not DuckDB-expressible → rows-only driver check;
    // exact semantics covered by golden unit tests (StringsSpec).
    Q("q20_custom_initcap",
      (s, dir) => t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
        Strings.customInitcapUdf(col("c_name")).as("c_name_initcap"))
        .orderBy("c_custkey"),
      None),

    Q("q21_fix_up_name",
      (s, dir) => t(s, dir, "customer").select(col("c_custkey"),
        Strings.fixUpNameUdf(
          concat(upper(col("c_name")), lit(", "), lower(col("c_mktsegment"))))
          .as("fixed_name")).orderBy("c_custkey"),
      None),

    Q("q22_fix_dodgy_statuses",
      (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, lit("complted"))
          .when(col("o_orderkey") % 3 === 1, lit("DISCONTD"))
          .otherwise(lit("enrolled")).as("raw_status"))
        .withColumn("fixed_status", Strings.fixDodgyStatusesUdf(col("raw_status")))
        .orderBy("o_orderkey"),
      None),

    Q("q23_df_shape",
      (s, dir) => {
        val (rows, cols, _) = TableIO.dfShape(t(s, dir, "lineitem"))
        import s.implicits._
        Seq((rows, cols)).toDF("row_count", "col_count")
      },
      Some("SELECT count(*) AS row_count, CAST(11 AS INT) AS col_count FROM lineitem")),
  )
}
