package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Semi-structured (JSON string) column handling: bounded-sample schema
  * inference plus whole-corpus typed extraction — the shape of every
  * event-props / API-payload column in a training-data lake.
  *
  * Scale split: schema INFERENCE reads a seeded sample capped at
  * `maxSampleRows` through Spark's JSON reader (driver holds only the
  * merged schema — the same bounded-fit pattern as the BPE vocabulary and
  * the IVF/PQ codebooks); EXTRACTION is `from_json` at that schema — a
  * codegen'd per-row kernel, zero shuffle, applied to all 100 TB. A field
  * that first appears outside the sample parses as absent (null) — the
  * documented trade of sampled inference; pass an explicit schema to
  * widen.
  */
object Semistructured {

  /** Schema of a JSON string column, inferred from a deterministic seeded
    * sample of at most `maxSampleRows` non-null rows. */
  def inferJsonSchema(spark: SparkSession, df: DataFrame, jsonCol: String,
      maxSampleRows: Long = 10000L, seed: Long = 7L): StructType = {
    require(maxSampleRows >= 1, "need a positive sample cap")
    import spark.implicits._
    val nonNull = df.select(col(jsonCol).cast("string")).na.drop()
    // seeded fraction-free cap: deterministic hash order, then limit —
    // never a full-table sort (TakeOrdered keeps k rows per partition)
    val sample = nonNull
      .orderBy(xxhash64(col(jsonCol), lit(seed)))
      .limit(maxSampleRows.min(Int.MaxValue).toInt)
      .as[String]
    spark.read.json(sample).schema
  }

  /** `outCol` = `from_json(jsonCol)` at `schema` (or at a freshly inferred
    * one). PERMISSIVE semantics: malformed documents parse to null, never
    * fail the job — corpus JSON is always partly broken. */
  def withJsonParsed(spark: SparkSession, df: DataFrame, jsonCol: String,
      outCol: String = "json", schema: Option[StructType] = None): DataFrame = {
    val s = schema.getOrElse(inferJsonSchema(spark, df, jsonCol))
    df.withColumn(outCol, from_json(col(jsonCol).cast("string"), s))
  }

  /** Shred a JSON string column into top-level typed columns
    * (`prefix<field>` for every top-level field of the inferred/supplied
    * schema), dropping the raw string. Nested fields stay nested — one
    * level of shredding per call is the predictable contract. */
  def flattenJson(spark: SparkSession, df: DataFrame, jsonCol: String,
      prefix: String = "", schema: Option[StructType] = None): DataFrame = {
    val s = schema.getOrElse(inferJsonSchema(spark, df, jsonCol))
    // withColumn replaces in place — a JSON field shadowing an existing
    // column would silently destroy real data, so collide loudly instead
    val collisions = s.fieldNames.map(prefix + _)
      .filter(n => n != jsonCol && df.columns.contains(n))
    require(collisions.isEmpty,
      s"flattenJson would overwrite existing column(s) ${collisions.mkString(", ")}: " +
        "pass a prefix to disambiguate")
    val parsed = df.withColumn("__j", from_json(col(jsonCol).cast("string"), s))
    s.fields.foldLeft(parsed) { (d, f) =>
        d.withColumn(prefix + f.name, col("__j").getField(f.name))
      }
      .drop("__j", jsonCol)
  }
}
