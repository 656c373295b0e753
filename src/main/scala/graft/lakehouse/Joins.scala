package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's one real join operator: a null-safe broadcast
  * dimension-key substitution join ("simpleMap") plus its select-list
  * helpers. Reference: ecu/sbl/aace/datalake/common.py:918-991.
  */
object Joins {

  /** common.py:593-607 — replace-then-append select-list surgery, as a pure
    * function (the reference mutates its input list):
    *  - oldVal absent        → list :+ newVal
    *  - newVal already there → list unchanged
    *  - else                 → oldVal's slot ← newVal, oldVal appended last
    */
  def insertValueIntoList(theList: Seq[String], oldVal: String, newVal: String): Seq[String] =
    if (!theList.contains(oldVal)) theList :+ newVal
    else if (theList.contains(newVal)) theList
    else theList.map(v => if (v == oldVal) newVal else v) :+ oldVal

  /** common.py:615-616 */
  def replaceValueInList(theList: Seq[String], oldVal: String, newVal: String): Seq[String] =
    theList.map(v => if (v == oldVal) newVal else v)

  /** common.py:918-924 — null-safe equi-join predicate between aliased
    * sides. `<=>` (EqualNullSafe) is exactly `a = b OR (a IS NULL AND b IS
    * NULL)` and, unlike the OR form, stays a hash-joinable key. */
  def getJoinCondition(factCol: String, mapCol: String = null): Column = {
    val mc = if (mapCol == null) factCol else mapCol
    col(s"fact.$factCol") <=> col(s"map.$mc")
  }

  /** common.py:981-991 — build the post-join select list: substitute
    * `indexColumn` at `valColumn`'s position (appending `valColumn` last),
    * qualify `valColumn` with `fact.` and `indexColumn` with `map.`, and
    * fact-qualify any bare name that also exists on the map side. */
  def insertColumnAndAlias(columns: Seq[String], valColumn: String,
      indexColumn: String, mapColumns: Seq[String] = Seq.empty): Seq[String] = {
    val cols = insertValueIntoList(columns, valColumn, indexColumn)
    val aliased = cols.map {
      case c if c == valColumn => s"fact.$c"
      case c if c == indexColumn => s"map.$c"
      case c => c
    }
    if (mapColumns.nonEmpty)
      aliased.map(c => if (!c.contains('.') && mapColumns.contains(c)) s"fact.$c" else c)
    else aliased
  }

  /** common.py:972-973 */
  def aliasColumns(selectCols: Seq[String], indexCol: String): Seq[String] =
    selectCols.map(c => if (c == indexCol) s"map.$c" else s"fact.$c")

  /** common.py:932-964 — dimension-key substitution join. The map's FIRST
    * column is the surrogate index; joins fact.joinCol <=> map.joinCol with
    * the map side broadcast (dimension tables are small — at 100 TB fact
    * scale this is the difference between a map-side hash join and a full
    * shuffle), then selects the fact columns with `joinCol` replaced by the
    * index (original joinCol kept at the end — reference behavior).
    *
    * Row preservation (map key unique) is asserted via before/after counts.
    * The joined frame is persisted between the assertion count and the
    * returned handle so lineage is not recomputed (the reference re-scans
    * three times); pass checkCounts=false to skip both actions at scale. */
  def simpleMap(factDF: DataFrame, metadataDF: DataFrame, joinCol: String,
      joinType: String = "inner", checkCounts: Boolean = true): DataFrame = {
    val indexCol = metadataDF.columns.head
    val factCols = factDF.columns.toSeq
    if (!factCols.contains(joinCol)) {
      if (factCols.contains(indexCol)) {
        System.err.println(s"$joinCol not in factDF - already replaced by $indexCol")
        return factDF
      } else throw new IllegalArgumentException(s"$joinCol not in factDF")
    }
    if (factCols.contains(indexCol))
      throw new IllegalArgumentException(s"$indexCol already in factDF. This shouldn't happen")

    val aliasedFact = factDF.alias("fact")
    val theMap = metadataDF.select(indexCol, joinCol).alias("map")
    val before = if (checkCounts) factDF.count() else -1L

    val joined = aliasedFact
      .join(broadcast(theMap), getJoinCondition(joinCol), joinType)
      .select(insertColumnAndAlias(factCols, joinCol, indexCol,
        theMap.columns.toSeq).map(col): _*)

    if (checkCounts) {
      joined.persist(StorageLevel.MEMORY_AND_DISK)
      val after = joined.count()
      if (before != after) {
        joined.unpersist()
        throw new IllegalStateException(
          s"simpleMap($joinCol): row count changed $before -> $after " +
            "(map key not unique, or inner join dropped unmatched rows)")
      }
    }
    joined
  }

  /** Skew-safe equi-join for when the "dimension" is too big to broadcast
    * AND the fact's key distribution is skewed (a handful of hot keys melt
    * one reducer in a plain sort-merge join). Classic salting: fact rows
    * get a uniform salt in [0, salts); the right side is exploded `salts`
    * times; the join key becomes (key, salt), spreading each hot key over
    * `salts` reducers. AQE's skew-join handles moderate skew on its own —
    * reach for this when a single key exceeds what one executor can hold.
    * Result equals the plain inner join (spec-verified). */
  def saltedSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Bloom-filter semi-join reduction: when the build side is small but
    * past the broadcast-HASH-TABLE budget, a Bloom filter over its keys IS
    * broadcastable — probe it on the fact side BEFORE the shuffle, so only
    * may-match rows (selectivity + false-positive rate) pay exchange and
    * sort cost. The subsequent real join removes Bloom false positives, so
    * the result is exactly the plain join (what Spark's own
    * InjectRuntimeFilter does for suitable shapes; this is the explicit
    * operator form with a chosen fpp). `expectedKeys` sizes the filter —
    * pass the build side's approximate distinct count. */
  def bloomSemiJoin(fact: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    // pre-filtering the fact side is only sound when unmatched fact rows
    // are dropped anyway — an outer join here would lose rows
    require(joinType == "inner" || joinType == "left_semi",
      s"bloomSemiJoin only supports inner/left_semi, got $joinType")
    // one bounded action on the BUILD side only (it is small by contract);
    // the fact side stays untouched until the filtered join executes.
    // Both sides probe the STRING rendering: sketch.BloomFilter hashes
    // longs and strings differently, so build and probe must agree on one.
    val bf = build.select(col(key).cast("string").as(key))
      .stat.bloomFilter(key, math.max(expectedKeys, 1L), fpp)
    val mightContain = udf((k: String) => k != null && bf.mightContainString(k))
    // probe in the BUILD key's type domain: cross-type keys (long fact vs
    // double build) render differently ("42" vs "42.0") and would be
    // falsely filtered — a permanent row loss the verifying join can't
    // undo. Casting the probe first only widens to false positives
    // (lossy narrowing collides; overflow nulls can't equal any in-range
    // build key), which the join corrects.
    val buildType = build.schema(key).dataType
    fact.filter(mightContain(col(key).cast(buildType).cast("string")))
      .join(build, Seq(key), joinType)
  }
}
