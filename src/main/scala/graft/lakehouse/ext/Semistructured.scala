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

  /** Schema drift between two batches of semi-structured records — the
    * gate a continuous-crawl pipeline runs before folding a new batch
    * into tables whose schema was inferred from the old one: per
    * top-level JSON key, presence counts and integer-permille presence
    * SHARES on each side, a status (`added` / `removed` / `stable`), and
    * the share drift (share_b − share_a, negative = fading). Records
    * whose payload does not parse as a JSON object carry no keys and
    * drop from the denominators (they are a different failure class —
    * route them through the quarantine gate, not the drift report).
    *
    * 100 TB shape: one per-row key-enumeration kernel (codegen'd
    * `json_object_keys`, no UDF) into ONE (key)-bounded aggregation per
    * side, a full-outer join on the key, and two 1-row denominators
    * broadcast in — output is |distinct keys| rows regardless of batch
    * size. */
  def jsonFieldDrift(a: DataFrame, b: DataFrame,
      jsonCol: String): DataFrame = {
    def profile(df: DataFrame, tag: String): (DataFrame, DataFrame) = {
      val keyed = df.select(
        explode(expr(s"json_object_keys(`$jsonCol`)")).as("key"))
      val counts = keyed.groupBy(col("key"))
        .agg(count(lit(1)).as(s"n_$tag"))
      val total = df.select(expr(s"json_object_keys(`$jsonCol`)")
          .isNotNull.as("ok"))
        .agg(sum(when(col("ok"), 1L).otherwise(0L)).as(s"total_$tag"))
      (counts, total)
    }
    val (ca, ta) = profile(a, "a")
    val (cb, tb) = profile(b, "b")
    ca.join(cb, Seq("key"), "full_outer")
      .crossJoin(ta).crossJoin(tb)
      .select(col("key"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        expr("(coalesce(n_a, 0) * 1000) div greatest(total_a, 1)")
          .as("share_a_permille"),
        expr("(coalesce(n_b, 0) * 1000) div greatest(total_b, 1)")
          .as("share_b_permille"),
        when(col("n_a").isNull, lit("added"))
          .when(col("n_b").isNull, lit("removed"))
          .otherwise(lit("stable")).as("status"))
      .withColumn("drift_permille",
        col("share_b_permille") - col("share_a_permille"))
  }
}
