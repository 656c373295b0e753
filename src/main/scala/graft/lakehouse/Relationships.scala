package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  * Scale notes: the name filter runs driver-side on schemas only, and ALL
  * cluster work is batched into exactly TWO Spark actions regardless of how
  * many candidate pairs there are:
  *
  *  1. one stats job — every table's candidate columns are exploded into
  *     `(col_name, canonical_value)` rows in a single pass and aggregated to
  *     `(count, countDistinct, min, max)` per column; the per-table frames
  *     are unioned so the whole schema's statistics come back in one collect;
  *  2. one coverage job — pairs that survive a driver-side min/max
  *     range-overlap prefilter (free, from the stats) are evaluated together:
  *     each table's distinct `(col_name, value)` key set joins the candidate
  *     pair list (broadcast) and then the to-side key set, and a single
  *     `groupBy(pair_id).count` yields every pair's coverage at once.
  *
  * Nothing is collected beyond one row per column (stats) and one row per
  * pair (coverage). Distinct key sets of a 100 TB fact table are
  * |keys|-sized, not |rows|-sized, after partial aggregation, and the
  * pair-list join is a broadcast — the big sides shuffle once on
  * (column, value), not once per pair.
  *
  * Values are canonicalized per type class so heterogeneous columns can
  * share one exploded frame: numerics/booleans → double, timestamps →
  * micros, everything else → an injective string form. Equality on the
  * canonical form matches Spark's implicit-cast join semantics for the
  * type-compatible pairs the name filter admits (doubles are exact through
  * 2^53 — beyond any TPC-H-shaped key domain).
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

  /** Canonical per-type-class projection of `f` into the shared exploded
    * frame: exactly one of (v_num, v_str, v_ts) is populated, and
    * type-compatible pairs always populate the same slot, so null-safe
    * equality over all three is equality on the pair's common type.
    * Integral columns ADDITIONALLY populate v_int (exact long): the double
    * slot keeps cross-type numeric pairs joinable (Spark's implicit-cast
    * semantics), while v_int restores exactness for integral⇄integral
    * pairs whose values exceed 2^53 — distinct bigint ids must never
    * collapse into one double. */
  private def canonical(f: StructField): (Column, Column, Column, Column) = {
    val c = col(f.name)
    val nNum = lit(null).cast(DoubleType)
    val nStr = lit(null).cast(StringType)
    val nLong = lit(null).cast(LongType)
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (c.cast(DoubleType), nStr, nLong, c.cast(LongType))
      // scale-0 decimals are ids too (unsigned-bigint columns arrive as
      // decimal(20,0)): give them the exact slot — values beyond long
      // range cast to null and fall back to the documented double
      // semantics instead of silently collapsing IN-RANGE distinct ids
      case d: DecimalType if d.scale == 0 =>
        (c.cast(DoubleType), nStr, nLong, c.cast(LongType))
      case _: NumericType | BooleanType =>
        (c.cast(DoubleType), nStr, nLong, nLong)
      case _: TimestampType => (nNum, nStr, unix_micros(c), nLong)
      case BinaryType => (nNum, hex(c), nLong, nLong)
      case _ => (nNum, c.cast(StringType), nLong, nLong) // string, date, …
    }
  }

  /** `(col_name, v_num, v_str, v_ts, v_int)` rows for every candidate
    * column of `df`, one scan, nulls dropped — the shared shape both the
    * stats and the coverage jobs aggregate over. */
  private def explodedKeys(df: DataFrame, fields: Seq[StructField]): DataFrame = {
    val entries = fields.map { f =>
      val (vn, vs, vt, vi) = canonical(f)
      struct(lit(f.name).as("cn"), vn.as("vn"), vs.as("vs"), vt.as("vt"),
        vi.as("vi"), col(f.name).isNotNull.as("nn"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .where(col("e.nn"))
      .select(col("e.cn").as("cn"), col("e.vn").as("vn"),
        col("e.vs").as("vs"), col("e.vt").as("vt"), col("e.vi").as("vi"))
  }

  /** Spark's string min/max order by UTF-8 bytes (unsigned); Java's default
    * String ordering compares UTF-16 code units, which disagrees for
    * supplementary characters — the prefilter must use Spark's order or an
    * overlapping range could be judged disjoint and a real relationship
    * silently pruned. */
  private val utf8Ord: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  private final case class ColStats(cnt: Long, dist: Long,
      minN: Option[Double], maxN: Option[Double],
      minS: Option[String], maxS: Option[String],
      minT: Option[Long], maxT: Option[Long],
      minI: Option[Long], maxI: Option[Long]) {
    def overlaps(o: ColStats): Boolean = {
      def ov[T](aMin: Option[T], aMax: Option[T], bMin: Option[T],
          bMax: Option[T])(implicit ord: Ordering[T]): Boolean =
        (aMin, aMax, bMin, bMax) match {
          case (Some(lo), Some(hi), Some(olo), Some(ohi)) =>
            !(ord.lt(hi, olo) || ord.gt(lo, ohi))
          case _ => false // slots of different classes never both populate
        }
      ov(minN, maxN, o.minN, o.maxN) || ov(minS, maxS, o.minS, o.maxS)(utf8Ord) ||
        ov(minT, maxT, o.minT, o.maxT) || ov(minI, maxI, o.minI, o.maxI)
    }
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
    if (candidates.isEmpty) return Nil

    val spark = tables.head._2.sparkSession
    val byName = tables.toMap
    // only columns that participate in some candidate pair get scanned
    val neededCols: Map[String, Seq[StructField]] = {
      val names = candidates.flatMap { case (ft, _, fc, tt, _, tc) =>
        Seq(ft -> fc, tt -> tc) }.toSet
      names.groupBy(_._1).map { case (tn, cs) =>
        val want = cs.map(_._2)
        tn -> byName(tn).schema.fields.toSeq.filter(f => want(f.name))
      }
    }

    // ---- action 1: all column statistics in one job ------------------------
    // Every table's candidate columns are exploded, unioned, and
    // pre-aggregated to (table, column, value) -> multiplicity in ONE
    // shuffle; that frame IS the distinct key set the coverage join needs,
    // so it is persisted and each table is scanned exactly once. A single
    // flat plan (not one agg pipeline per table) keeps the stage/task count
    // constant in the number of tables — scheduling overhead, not data
    // volume, dominates small inputs, and at scale one wide shuffle beats
    // many narrow ones.
    val keyCounts: DataFrame = neededCols.map { case (tn, fields) =>
      explodedKeys(byName(tn), fields).withColumn("tbl", lit(tn))
    }.reduce(_.unionByName(_))
      .groupBy("tbl", "cn", "vn", "vs", "vt", "vi").agg(count(lit(1)).as("mult"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsDF = keyCounts.groupBy("tbl", "cn").agg(
      sum("mult").as("cnt"),
      count(lit(1)).as("dist"),
      min("vn").as("min_n"), max("vn").as("max_n"),
      min("vs").as("min_s"), max("vs").as("max_s"),
      min("vt").as("min_t"), max("vt").as("max_t"),
      min("vi").as("min_i"), max("vi").as("max_i"))
    val stats: Map[(String, String), ColStats] = statsDF.collect().map { r =>
      def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      def optS(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
      def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getString(0), r.getString(1)) -> ColStats(r.getLong(2), r.getLong(3),
        optD(4), optD(5), optS(6), optS(7), optL(8), optL(9),
        optL(10), optL(11))
    }.toMap

    // driver-side pruning from the stats alone: multiplicity, empty from
    // side, and (when a positive coverage is required) min/max range overlap
    // — disjoint ranges prove coverage 0 without touching the cluster again.
    final case class Cand(pid: Long, ft: String, fc: String, tt: String,
        tc: String, fromDist: Long, toUnique: Boolean)
    val empty = ColStats(0L, 0L, None, None, None, None, None, None, None, None)
    val survivors = candidates.zipWithIndex.flatMap {
      case ((ft, _, fc, tt, _, tc), i) =>
        val fs = stats.getOrElse((ft, fc), empty)
        val ts = stats.getOrElse((tt, tc), empty)
        val toUnique = ts.cnt == ts.dist && ts.cnt > 0
        if (fs.dist == 0L) None
        else if (!toUnique && !includeManyToMany) None
        else if (coverageThreshold > 0 && !fs.overlaps(ts)) None
        else Some(Cand(i.toLong, ft, fc, tt, tc, fs.dist, toUnique))
    }

    // ---- action 2: every surviving pair's coverage in one unioned job -----
    val coveredByPid: Map[Long, Long] =
      if (survivors.isEmpty) Map.empty
      else {
        import spark.implicits._
        // One flat plan for every pair at once: the cached key set joins the
        // broadcast pair list (tagging each from-key row with its pair), then
        // joins itself on the to-side (table, column, value). Each from-key
        // matches at most one to-key row, so no blowup; the big sides shuffle
        // once on (table, column, value) regardless of how many pairs there
        // are.
        val pairDf = broadcast(survivors.map(p => (p.pid, p.ft, p.fc, p.tt, p.tc))
          .toDF("pid", "ftbl", "fc", "ttbl", "tc"))
        val fk = keyCounts.join(pairDf,
            col("tbl") === col("ftbl") && col("cn") === col("fc"))
          .select(col("pid"), col("ttbl"), col("tc"),
            col("vn"), col("vs"), col("vt"), col("vi"))
        val fromKey = struct(col("vn"), col("vs"), col("vt"), col("vi"))
        // shuffle only the to-side (table, column)s that some surviving
        // pair can actually match — the rest of the key set can never
        // join (guide §2.3: filter before the exchange)
        val toSides = survivors.map(p => (p.tt, p.tc)).distinct
        val tkFilter = toSides.map { case (t, c) =>
          (col("tbl") === lit(t)) && (col("cn") === lit(c))
        }.reduce(_ || _)
        val tk = keyCounts.filter(tkFilter)
          .select(col("tbl").as("ktbl"), col("cn").as("kcn"),
          col("vn").as("tvn"), col("vs").as("tvs"), col("vt").as("tvt"),
          col("vi").as("tvi"))
        // equi-keys stay (table, column, vn, vs, vt); the exact-integral
        // check is a residual predicate — when BOTH sides carry v_int it
        // must match exactly (distinct >2^53 longs that collide as doubles
        // stay distinct), while integral⇄fractional pairs (one side null)
        // keep Spark's implicit-cast double semantics
        val covDF = fk.join(tk, col("ktbl") === col("ttbl") &&
            col("kcn") === col("tc") &&
            (col("vn") <=> col("tvn")) && (col("vs") <=> col("tvs")) &&
            (col("vt") <=> col("tvt")) &&
            (col("vi").isNull || col("tvi").isNull || col("vi") === col("tvi")))
          // count DISTINCT from-keys that found a match, not join matches:
          // a fractional from-key (vi null) can legitimately match several
          // integral to-keys that collide in double space — that is one
          // covered key, not several
          .groupBy("pid").agg(countDistinct(fromKey).as("covered"))
        covDF.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    keyCounts.unpersist()

    val out = survivors.flatMap { c =>
      val coverage = coveredByPid.getOrElse(c.pid, 0L).toDouble / c.fromDist
      if (coverage >= coverageThreshold)
        Some(Relationship(c.ft, c.fc, c.tt, c.tc,
          if (c.toUnique) "m:1" else "m:m", coverage))
      else None
    }
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
