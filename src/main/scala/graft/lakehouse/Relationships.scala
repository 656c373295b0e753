package graft.lakehouse

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PK/FK relationship discovery across registered tables — a from-scratch
  * Spark implementation of the semantics the reference outsources to
  * `sempy.relationships.find_relationships` + graphviz plotting
  * (ecu/sbl/aace/datalake/common.py:995-1076; parameter semantics documented
  * inline at common.py:1021-1042):
  *
  *  - candidate column pairs need name similarity >= nameSimilarityThreshold
  *    (Ratcliff–Obershelp, the same metric the library uses for value
  *    fix-up) and compatible types;
  *  - propose (fromTable.fromCol -> toTable.toCol) when coverage =
  *    |distinct(from) ∩ distinct(to)| / |distinct(from)| >= coverageThreshold;
  *  - multiplicity "m:1" when the to-column is unique, else "m:m"
  *    (emitted only when includeManyToMany).
  *
  * Scale notes: the name filter runs driver-side on schemas only, so the
  * cluster work is one distinct() per *candidate* column (cached and reused
  * across pairs) plus one left_semi count per surviving pair — each a
  * key-partitioned aggregation that parallelizes; nothing is collected
  * beyond counts. Distinct key sets of a 100 TB fact table are |keys|-sized,
  * not |rows|-sized, after partial aggregation.
  */
object Relationships {

  final case class Relationship(
      fromTable: String, fromColumn: String,
      toTable: String, toColumn: String,
      multiplicity: String, coverage: Double)

  private def typeCompatible(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x, y) if x == y => true
    case (_: NumericType, _: NumericType) => true
    case (StringType, StringType) => true
    case (_: TimestampType, _: TimestampType) => true
    case _ => false
  }

  def findRelationships(
      tables: Seq[(String, DataFrame)],
      coverageThreshold: Double = 1.0,
      nameSimilarityThreshold: Double = 0.8,
      includeManyToMany: Boolean = true): Seq[Relationship] = {

    // driver-side candidate generation on schemas only
    val cols: Seq[(String, DataFrame, StructField)] = for {
      (tn, df) <- tables
      f <- df.schema.fields
    } yield (tn, df, f)

    val candidates = for {
      (ft, fdf, ff) <- cols
      (tt, tdf, tf) <- cols
      if ft != tt
      if typeCompatible(ff.dataType, tf.dataType)
      if Strings.sequenceRatio(ff.name, tf.name) >= nameSimilarityThreshold
    } yield (ft, fdf, ff.name, tt, tdf, tf.name)

    // per-column stats, computed once and reused across candidate pairs;
    // candidates are evaluated CONCURRENTLY (Spark actions are thread-safe,
    // and these are many small jobs — serial execution leaves the cluster
    // idle between driver round-trips)
    val distinctCache =
      new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]
    val statsCache =
      new java.util.concurrent.ConcurrentHashMap[(String, String), (Long, Long)]
    def distinctOf(t: String, df: DataFrame, c: String): DataFrame =
      distinctCache.computeIfAbsent((t, c), _ =>
        df.select(col(c).as("k")).where(col(c).isNotNull).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // (nonNullCount, distinctCount) — uniqueness check for multiplicity
    def statsOf(t: String, df: DataFrame, c: String): (Long, Long) =
      statsCache.computeIfAbsent((t, c), _ => {
        val r = df.agg(count(col(c)), countDistinct(col(c))).head()
        (r.getLong(0), r.getLong(1))
      })

    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val futures = candidates.map { case (ft, fdf, fc, tt, tdf, tc) => Future {
      val (toCount, toDistinct) = statsOf(tt, tdf, tc)
      val toUnique = toCount == toDistinct && toCount > 0
      if (!toUnique && !includeManyToMany) None
      else {
        val fromD = distinctOf(ft, fdf, fc)
        val toD = distinctOf(tt, tdf, tc)
        val fromCount = fromD.count()
        if (fromCount == 0) None
        else {
          val covered = fromD.join(toD, fromD("k") === toD("k"), "left_semi").count()
          val coverage = covered.toDouble / fromCount
          if (coverage >= coverageThreshold)
            Some(Relationship(ft, fc, tt, tc, if (toUnique) "m:1" else "m:m", coverage))
          else None
        }
      }
    }}
    val out = futures.flatMap(f => Await.result(f, Duration.Inf))
    pool.shutdown()
    distinctCache.values().forEach(_.unpersist())
    out.sortBy(r => (r.fromTable, r.fromColumn, r.toTable, r.toColumn))
  }

  /** Relationships as a DataFrame (the shape sempy's find_relationships
    * returns as a pandas frame). */
  def findRelationshipsDF(spark: SparkSession, tables: Seq[(String, DataFrame)],
      coverageThreshold: Double = 1.0, nameSimilarityThreshold: Double = 0.8,
      includeManyToMany: Boolean = true): DataFrame = {
    val rels = findRelationships(tables, coverageThreshold,
      nameSimilarityThreshold, includeManyToMany)
    val schema = StructType(Seq(
      StructField("from_table", StringType, nullable = false),
      StructField("from_column", StringType, nullable = false),
      StructField("to_table", StringType, nullable = false),
      StructField("to_column", StringType, nullable = false),
      StructField("multiplicity", StringType, nullable = false),
      StructField("coverage", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rels.map(r =>
        Row(r.fromTable, r.fromColumn, r.toTable, r.toColumn, r.multiplicity,
          r.coverage)), 1),
      schema)
  }

  /** DOT-text emitter replacing the reference's graphviz SVG pipeline
    * (common.py:1053-1072) — same information, no native dependency. */
  def toDot(rels: Seq[Relationship], label: String = "lakehouse"): String = {
    val sb = new StringBuilder
    sb.append("digraph relationships {\n")
    sb.append(s"""  label="$label";\n  rankdir=LR;\n  node [shape=box];\n""")
    rels.map(r => (r.fromTable, r.toTable)).distinct.foreach { case (f, t) =>
      sb.append(s"""  "$f";\n  "$t";\n""")
    }
    rels.foreach { r =>
      sb.append(s"""  "${r.fromTable}" -> "${r.toTable}" """ +
        s"""[label="${r.fromColumn} -> ${r.toColumn} (${r.multiplicity})"];\n""")
    }
    sb.append("}\n")
    sb.toString
  }

  /** common.py:1075-1076 — discovery over every table written this session
    * (the ALL_TABLES registry). Returns (relationships, dot). */
  def findAndDiagramRelationships(spark: SparkSession,
      coverageThreshold: Double = 1.0, nameSimilarityThreshold: Double = 0.8,
      includeManyToMany: Boolean = true): (Seq[Relationship], String) = {
    val tables = Catalog.allTables.toSeq.map { case (n, (df, _)) => (n, df) }
    val rels = findRelationships(tables, coverageThreshold,
      nameSimilarityThreshold, includeManyToMany)
    (rels, toDot(rels))
  }
}
