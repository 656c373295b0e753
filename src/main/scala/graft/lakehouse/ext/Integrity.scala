package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anti-entropy table verification (the Merkle-exchange pattern of
  * Dynamo/Cassandra repair, flattened to one level): summarize a table as
  * `buckets` order-independent integer fingerprints, compare two tables'
  * summaries, and resynchronize ONLY the rows in differing buckets. At
  * 100 TB this is the difference between shipping O(rows) for a full diff
  * and shipping O(buckets) fingerprints + O(divergence) repair rows —
  * how a replica (e.g. one maintained by [[graft.lakehouse.TableIO
  * .applyChanges]]) is verified against its source without reading either
  * side twice.
  *
  * Portability: the row digest is the 60-bit sha-256 prefix of a
  * caller-supplied CANONICAL STRING (the caller controls number
  * rendering — floats must be fixed-pointed to strings identically on
  * every engine); the bucket is the key digest mod `buckets`; the bucket
  * fingerprint is `bit_xor` of row digests plus a row count — both
  * order-independent, overflow-free, and bit-identical on any engine, so
  * a DuckDB oracle replays the whole exchange. (XOR alone is blind to a
  * row duplicated an even number of times; the count catches every
  * multiplicity change, which is why both are part of the fingerprint.)
  */
object Integrity {

  /** 60-bit sha-256 digest of a column's string form — the sketches'
    * portable hash recipe (Sketches.cmsHash). Codegen'd built-ins only. */
  def sha60Of(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")

  /** Null-unambiguous canonical row string: each column renders as
    * `len:value` with nulls as `~` — so ("a", null) and ("a", "") and
    * (null, "a") all canonicalize differently. Plain `concat_ws` SKIPS
    * nulls (("a", null, "b") ≡ ("a", "b", null)) and a bare separator
    * can be forged by a value containing it; the length prefix closes
    * both holes. SQL replay: `'<len>:' || value` per field, `'~'` for
    * null, '#'-joined. Numeric columns should be fixed-pointed to
    * strings BY THE CALLER first — float rendering differs across
    * engines. */
  def canon(cols: Column*): Column =
    concat_ws("#", cols.map(c =>
      coalesce(
        concat(length(c.cast("string")).cast("string"), lit(":"),
          c.cast("string")),
        lit("~"))): _*)

  /** Per-bucket fingerprints of `df`: (bucket, n_rows, checksum).
    * `keyCanon` decides WHICH bucket a row lands in (digest of the key's
    * canonical string, mod `buckets` — a repaired row must land in the
    * same bucket on both sides, so key canon must not include mutable
    * columns); `rowCanon` decides WHAT is fingerprinted (the full row's
    * canonical string). One partial-aggregated shuffle of at most
    * `buckets` rows per partition; the row stream never shuffles. */
  def bucketChecksums(df: DataFrame, keyCanon: Column, rowCanon: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    df.select(
        pmod(sha60Of(keyCanon), lit(buckets.toLong)).cast("int").as("bucket"),
        sha60Of(rowCanon).as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("checksum"))
  }

  /** Buckets where two tables' fingerprints disagree:
    * (bucket, n_a, n_b, checksum_a, checksum_b), zero-filled for buckets
    * present on one side only. Empty result ⇔ the tables agree bucket by
    * bucket (up to the 60-bit XOR's collision odds). The exchange is
    * O(buckets) regardless of table size. */
  def checksumDiff(a: DataFrame, b: DataFrame, keyCanon: Column,
      rowCanon: Column, buckets: Int): DataFrame = {
    val ca = bucketChecksums(a, keyCanon, rowCanon, buckets)
      .withColumnsRenamed(Map("n_rows" -> "n_a", "checksum" -> "checksum_a"))
    val cb = bucketChecksums(b, keyCanon, rowCanon, buckets)
      .withColumnsRenamed(Map("n_rows" -> "n_b", "checksum" -> "checksum_b"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("checksum_a"), lit(0L)).as("checksum_a"),
        coalesce(col("checksum_b"), lit(0L)).as("checksum_b"))
      .filter(col("n_a") =!= col("n_b") ||
        col("checksum_a") =!= col("checksum_b"))
  }

  /** The source rows a replica needs to resynchronize the differing
    * buckets: source rows whose bucket fingerprint disagrees. The repair
    * payload is O(rows-in-divergent-buckets) — with healthy replicas and
    * enough buckets, a vanishing fraction of the table. The replica
    * applies it as a keyed replace over those buckets' keys. */
  def repairRows(source: DataFrame, replica: DataFrame, keyCanon: Column,
      rowCanon: Column, buckets: Int): DataFrame = {
    val bad = checksumDiff(source, replica, keyCanon, rowCanon, buckets)
      .select("bucket")
    source
      .withColumn("bucket",
        pmod(sha60Of(keyCanon), lit(buckets.toLong)).cast("int"))
      .join(broadcast(bad), Seq("bucket"), "left_semi")
  }
}
