package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType,
  LongType, StructField, StructType}

import graft.lakehouse.{Catalog, LakehouseProps, TableIO, Versioned}

/** A PERSISTED product-quantization ANN index as a pair of versioned
  * lakehouse tables — the index-once / query-many / fold-batches-in
  * contract the engine's other indexes already keep (the q64 near-dup
  * band index, the q233 positional index), applied to vectors. Without
  * it, [[Similarity.pqTopK]]-style calls retrain codebooks and re-encode
  * the corpus on EVERY query — at 100 TB the difference between an index
  * and a scan.
  *
  *  - `<name>_codebooks`: (s, cidx, cv array<bigint>) — the fixed-point
  *    Lloyd codebooks ([[Clustering.lloydRoundsGrouped]] arithmetic:
  *    quantized integer vectors, init from the smallest corpus ids,
  *    exact integer distances, floor-division means), with the encoding
  *    parameters (m, sub, dim, scale, offset) in the commit manifest —
  *    frozen after [[buildPqIndex]]; every later batch encodes against
  *    them, so codes stay mutually comparable across batches.
  *  - `<name>`: (vec_id, cv array<double>, code array<int>) — the coded
  *    corpus. [[appendPqIndex]] encodes ONLY its batch (one compiled
  *    per-row kernel over the batch, one ordinary versioned append):
  *    O(batch) work, never O(corpus); the index table is never read.
  *
  * [[queryPqIndex]] scans the persisted codes with the same integer ADC
  * LUTs as [[Similarity.pqTopKPortable]] (map-side heap, one merge
  * Exchange); `reRank > 0` rescores the top candidates exactly from the
  * stored vectors — with `reRank` ≥ corpus it degenerates to exact
  * search, which is what lets a query over the
  * persisted-then-incrementally-updated index hash-check against the
  * from-scratch brute-force oracle (the q169 pattern).
  *
  * Both tables are ordinary versioned tables: time travel shows exactly
  * which batch introduced a code, RESTORE rolls the index back with the
  * data, and the append commits atomically (a crashed encode re-runs
  * without partial state).
  */
object AnnIndex {

  private val MetaPrefix = "annpq:"

  private case class PqParams(m: Int, sub: Int, dim: Int, scale: Long,
      offset: Long, books: Array[Array[Array[Long]]])

  private def codebooksName(name: String) = s"${name}_codebooks"

  private def readParams(spark: SparkSession, lh: LakehouseProps,
      name: String): PqParams = {
    val cbName = codebooksName(name)
    val dir = Catalog.tablePath(lh, cbName)
    val manifest = Versioned.latestVersion(dir)
      .flatMap(Versioned.readManifest(dir, _))
      .getOrElse(throw new IllegalArgumentException(
        s"no ANN index codebooks table '$cbName' — run buildPqIndex first"))
    def metaLong(key: String): Long = manifest.meta.get(MetaPrefix + key)
      .map(_.toLong).getOrElse(throw new IllegalStateException(
        s"codebooks table '$cbName' is missing $MetaPrefix$key metadata"))
    val m = metaLong("m").toInt
    val rows = TableIO.selectTable(spark, lh, cbName)
      .select("s", "cidx", "cv").collect()
    val ks = rows.map(_.getInt(1)).max + 1
    val books = Array.ofDim[Array[Long]](m, ks)
    rows.foreach(r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray)
    PqParams(m, metaLong("sub").toInt, metaLong("dim").toInt,
      metaLong("scale"), metaLong("offset"), books)
  }

  /** The per-row encode kernel: quantize, then per-subspace integer
    * argmin against the frozen codebooks (ties to the smallest index —
    * [[Clustering.argminKernel]]'s convention, so an engine replaying
    * the codebooks reproduces every code). */
  private def encodeUdf(p: PqParams) = udf((v: Seq[Double]) => {
    require(v.length == p.dim,
      s"vector dimension ${v.length} != index dimension ${p.dim}")
    val qv = Clustering.quantizeKernel(v, p.scale, p.offset)
    val code = new Array[Int](p.m)
    var s = 0
    while (s < p.m) {
      val cs = p.books(s)
      var best = Long.MaxValue; var bi = 0; var ci = 0
      while (ci < cs.length) {
        val cv = cs(ci)
        var d = 0L; var j = 0
        while (j < p.sub) {
          val x = qv(s * p.sub + j) - cv(j); d += x * x; j += 1
        }
        if (d < best) { best = d; bi = ci }
        ci += 1
      }
      code(s) = bi
      s += 1
    }
    code
  })

  private def prepared(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("cv"))

  /** Train portable codebooks on `corpus` and persist codebooks + the
    * coded corpus. Returns the number of vectors indexed. Training cost
    * is `iterations` fused zero-shuffle passes (all `m` subspaces per
    * pass); pass a deterministic, engine-reproducible fit subset via
    * `fit` to bound training on a huge corpus (e.g. `id % n = 0`). */
  def buildPqIndex(spark: SparkSession, lh: LakehouseProps, name: String,
      corpus: DataFrame, idCol: String, vecCol: String, m: Int = 8,
      codebookSize: Int = 16, iterations: Int = 2, scale: Long = 1024L,
      offset: Long = 1L << 20, fit: Option[DataFrame] = None): Long = {
    require(m >= 1 && codebookSize >= 1 && iterations >= 1,
      "buildPqIndex needs m, codebookSize, iterations >= 1")
    val quantUdf = udf((v: Seq[Double]) =>
      Clustering.quantizeKernel(v, scale, offset))
    val c = prepared(corpus, idCol, vecCol)
      .withColumn("qv", quantUdf(col("cv")))
      .persist()
    try {
      val fitFrame = fit.fold(c)(f => prepared(f, idCol, vecCol)
        .withColumn("qv", quantUdf(col("cv"))))
      val initVecs = fitFrame.orderBy("vec_id").limit(codebookSize)
        .select("qv").collect().map(_.getSeq[Long](0).toSeq).toIndexedSeq
      require(initVecs.nonEmpty, "buildPqIndex needs a non-empty corpus")
      val dim = initVecs.head.length
      require(initVecs.forall(_.length == dim),
        s"buildPqIndex needs a uniform vector dimension in '$vecCol'")
      require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
      val sub = dim / m
      val init: Map[Int, IndexedSeq[Seq[Long]]] = (0 until m).map(s =>
        s -> initVecs.map(v => v.slice(s * sub, (s + 1) * sub))).toMap
      val subFrame = fitFrame.select(posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(qv, s * $sub + 1, $sub))"))
        .as(Seq("gid", "qv")))
      val books = Clustering.lloydRoundsGrouped(subFrame, init, iterations,
        s"buildPqIndex('$name')")
      val booksArr: Array[Array[Array[Long]]] =
        Array.tabulate(m)(s => books(s).map(_.toArray).toArray)
      val cbRows: Seq[Row] = (0 until m).flatMap(s =>
        booksArr(s).zipWithIndex.map { case (cv, ci) =>
          Row(s, ci, cv.toSeq) })
      val cbSchema = StructType(Seq(
        StructField("s", IntegerType, nullable = false),
        StructField("cidx", IntegerType, nullable = false),
        StructField("cv", ArrayType(LongType), nullable = false)))
      val cbDf = spark.createDataFrame(
        java.util.Arrays.asList(cbRows: _*), cbSchema)
      TableIO.writeTable(spark, lh, codebooksName(name), cbDf,
        extraMeta = Map(
          MetaPrefix + "m" -> m.toString,
          MetaPrefix + "sub" -> sub.toString,
          MetaPrefix + "dim" -> dim.toString,
          MetaPrefix + "scale" -> scale.toString,
          MetaPrefix + "offset" -> offset.toString))
      val p = PqParams(m, sub, dim, scale, offset, booksArr)
      val coded = c.select(col("vec_id"), col("cv"),
        encodeUdf(p)(col("cv")).as("code"))
      TableIO.writeTable(spark, lh, name, coded).rowCount
    } finally c.unpersist(false)
  }

  /** Delete vectors from the persisted index — the right-to-be-forgotten
    * path into the ANN index (the [[Erasure]] contract applied to the
    * coded corpus): ONE versioned DELETE commit on the index table,
    * O(touched files) in rewrite mode or O(deleted rows) with deletion
    * vectors — never a rebuild. The codebooks stay FROZEN: they are a
    * statistical summary of the training corpus, not per-row data
    * (stated — a strict-erasure deployment retrains on its own
    * schedule). Queries after the delete return exactly what a
    * from-scratch index without those ids would (exact-mode
    * oracle-verified). Returns the remaining vector count. */
  def deletePqIndex(spark: SparkSession, lh: LakehouseProps, name: String,
      condition: String, deletionVectors: Boolean = false): Long =
    TableIO.deleteFromTable(spark, lh, name, condition,
      deletionVectors).rowCount

  /** Fold a new batch into the index: encode ONLY the batch against the
    * FROZEN codebooks and append — O(batch); neither the index table nor
    * the codebooks are rewritten (the codebooks table is not even
    * versioned forward). Returns the number of vectors appended. */
  def appendPqIndex(spark: SparkSession, lh: LakehouseProps, name: String,
      batch: DataFrame, idCol: String, vecCol: String): Long = {
    val p = readParams(spark, lh, name)
    val prepped = prepared(batch, idCol, vecCol)
    val coded = prepped.select(col("vec_id"), col("cv"),
      encodeUdf(p)(col("cv")).as("code"))
    TableIO.appendTable(spark, lh, name, coded)
    // the returned count scans the BATCH (O(batch)), not the index
    prepped.count()
  }

  // ---- persisted IVF index -------------------------------------------

  private val IvfMetaPrefix = "annivf:"

  private case class IvfParams(dim: Int, scale: Long, offset: Long,
      cents: Array[Array[Long]])

  private def centroidsName(name: String) = s"${name}_centroids"

  private def readIvfParams(spark: SparkSession, lh: LakehouseProps,
      name: String): IvfParams = {
    val cName = centroidsName(name)
    val dir = Catalog.tablePath(lh, cName)
    val manifest = Versioned.latestVersion(dir)
      .flatMap(Versioned.readManifest(dir, _))
      .getOrElse(throw new IllegalArgumentException(
        s"no IVF index centroids table '$cName' — run buildIvfIndex first"))
    def metaLong(key: String): Long = manifest.meta.get(IvfMetaPrefix + key)
      .map(_.toLong).getOrElse(throw new IllegalStateException(
        s"centroids table '$cName' is missing $IvfMetaPrefix$key metadata"))
    val rows = TableIO.selectTable(spark, lh, cName)
      .select("cidx", "cv").collect()
    val cents = new Array[Array[Long]](rows.map(_.getInt(0)).max + 1)
    rows.foreach(r => cents(r.getInt(0)) = r.getSeq[Long](1).toArray)
    IvfParams(metaLong("dim").toInt, metaLong("scale"), metaLong("offset"),
      cents)
  }

  private def cellUdf(p: IvfParams) = udf((v: Seq[Double]) => {
    require(v.length == p.dim,
      s"vector dimension ${v.length} != index dimension ${p.dim}")
    Clustering.argminKernel(
      Clustering.quantizeKernel(v, p.scale, p.offset), p.cents)._2
  })

  /** Persisted IVF twin of [[buildPqIndex]]: fixed-point Lloyd cell
    * centroids freeze as `<name>_centroids`; the corpus lands
    * cell-assigned as `<name>` (vec_id, cv, cell). Returns rows
    * indexed. */
  def buildIvfIndex(spark: SparkSession, lh: LakehouseProps, name: String,
      corpus: DataFrame, idCol: String, vecCol: String, nLists: Int = 8,
      iterations: Int = 2, scale: Long = 1024L, offset: Long = 1L << 20,
      fit: Option[DataFrame] = None): Long = {
    require(nLists >= 1 && iterations >= 1,
      "buildIvfIndex needs nLists, iterations >= 1")
    val quantUdf = udf((v: Seq[Double]) =>
      Clustering.quantizeKernel(v, scale, offset))
    val c = prepared(corpus, idCol, vecCol).persist()
    try {
      val fitFrame = fit.fold(c)(f => prepared(f, idCol, vecCol))
        .withColumn("qv", quantUdf(col("cv")))
      val init = fitFrame.orderBy("vec_id").limit(nLists).select("qv")
        .collect().map(_.getSeq[Long](0).toSeq).toIndexedSeq
      require(init.nonEmpty, "buildIvfIndex needs a non-empty corpus")
      val dim = init.head.length
      require(init.forall(_.length == dim),
        s"buildIvfIndex needs a uniform vector dimension in '$vecCol'")
      val cents = Clustering.lloydRoundsGrouped(
        fitFrame.select(lit(0).as("gid"), col("qv")),
        Map(0 -> init), iterations, s"buildIvfIndex('$name')")(0)
      val cDf = spark.createDataFrame(
        java.util.Arrays.asList(cents.zipWithIndex.map { case (cv, i) =>
          Row(i, cv) }: _*),
        StructType(Seq(
          StructField("cidx", IntegerType, nullable = false),
          StructField("cv", ArrayType(LongType), nullable = false))))
      TableIO.writeTable(spark, lh, centroidsName(name), cDf,
        extraMeta = Map(
          IvfMetaPrefix + "dim" -> dim.toString,
          IvfMetaPrefix + "scale" -> scale.toString,
          IvfMetaPrefix + "offset" -> offset.toString,
          IvfMetaPrefix + "nLists" -> cents.size.toString))
      val p = IvfParams(dim, scale, offset, cents.map(_.toArray).toArray)
      TableIO.writeTable(spark, lh, name,
        c.select(col("vec_id"), col("cv"), cellUdf(p)(col("cv")).as("cell")))
        .rowCount
    } finally c.unpersist(false)
  }

  /** Fold a batch into the IVF index: cell-assign ONLY the batch against
    * the frozen centroids and append — O(batch). */
  def appendIvfIndex(spark: SparkSession, lh: LakehouseProps, name: String,
      batch: DataFrame, idCol: String, vecCol: String): Long = {
    val p = readIvfParams(spark, lh, name)
    val prepped = prepared(batch, idCol, vecCol)
    TableIO.appendTable(spark, lh, name,
      prepped.select(col("vec_id"), col("cv"),
        cellUdf(p)(col("cv")).as("cell")))
    prepped.count()
  }

  /** ANN top-k over the PERSISTED IVF index: each query probes its
    * nProbe integer-nearest frozen centroids (ties: distance, then
    * index — [[Similarity.ivfTopKPortable]]'s convention) and
    * exact-scores only the matching cells of the persisted corpus. The
    * cell scan prunes at the source when the index table is partitioned
    * by cell. */
  def queryIvfIndex(spark: SparkSession, lh: LakehouseProps, name: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2): DataFrame = {
    require(k >= 1 && nProbe >= 1, "queryIvfIndex needs k, nProbe >= 1")
    val p = readIvfParams(spark, lh, name)
    val index = TableIO.selectTable(spark, lh, name)
    val probeUdf = udf((v: Seq[Double]) => {
      require(v.length == p.dim,
        s"query vector dimension ${v.length} != index dimension ${p.dim}")
      val qq = Clustering.quantizeKernel(v, p.scale, p.offset)
      p.cents.zipWithIndex.map { case (cv, i) =>
        var d = 0L; var j = 0
        while (j < cv.length) { val x = qq(j) - cv(j); d += x * x; j += 1 }
        (d, i)
      }.sortBy(identity).take(nProbe).map(_._2)
    })
    val q = prepared(queries, idCol, vecCol)
      .select(col("vec_id").as("query_id"), col("cv").as("qv"))
      .withColumn("cell", explode(probeUdf(col("qv"))))
    val scored = index.join(broadcast(q), "cell")
      .withColumn("cosine", Dedup.cosine(col("cv"), col("qv")))
      .select("query_id", "vec_id", "cosine")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }

  /** ANN top-k over the PERSISTED index: integer ADC LUTs against the
    * stored codes ([[Similarity.pqTopKPortable]]'s scoring — map-side
    * heap, one merge Exchange), then `reRank > 0` rescores the top
    * candidates exactly from the stored vectors (`reRank` ≥ corpus =
    * exact search, the verification mode). The query frame is collected
    * under the broadcast contract (`maxQueries` guard). */
  def queryPqIndex(spark: SparkSession, lh: LakehouseProps, name: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      reRank: Int = 0, maxQueries: Long = 100000L): DataFrame = {
    require(k >= 1, "queryPqIndex needs k >= 1")
    require(queries.limit((maxQueries + 1).min(Int.MaxValue).toInt).count()
        <= maxQueries,
      s"queryPqIndex collects the query frame (broadcast contract): more " +
        s"than $maxQueries query rows — raise maxQueries only if the " +
        "driver can hold the LUTs, or batch the queries")
    val p = readParams(spark, lh, name)
    val ks = p.books(0).length
    val index = TableIO.selectTable(spark, lh, name)
    val qRows = prepared(queries, idCol, vecCol).collect()
    val idType = queries.schema(idCol).dataType
    if (qRows.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(
          StructField("query_id", idType),
          StructField("vec_id", idType),
          StructField("rank", IntegerType),
          StructField(if (reRank > 0) "cosine" else "adc_dist",
            if (reRank > 0) DoubleType else LongType))))
    val luts: Array[Array[Long]] = qRows.map { r =>
      val qq = Clustering.quantizeKernel(r.getSeq[Double](1), p.scale,
        p.offset)
      require(qq.length == p.dim,
        s"query vector dimension ${qq.length} != index dimension ${p.dim}")
      val lut = new Array[Long](p.m * ks)
      var s = 0
      while (s < p.m) {
        var ci = 0
        while (ci < ks) {
          val cv = p.books(s)(ci)
          var d = 0L; var j = 0
          while (j < p.sub) {
            val x = qq(s * p.sub + j) - cv(j); d += x * x; j += 1
          }
          lut(s * ks + ci) = d
          ci += 1
        }
        s += 1
      }
      lut
    }
    val bcLuts = spark.sparkContext.broadcast(luts)
    val ksLocal = ks
    val adcUdf = udf((code: Seq[Int], qi: Int) => {
      val lut = bcLuts.value(qi)
      var d = 0L; var s = 0
      while (s < code.length) { d += lut(s * ksLocal + code(s)); s += 1 }
      d
    })
    val qSchema = StructType(Seq(
      StructField("query_id", idType),
      StructField("qv", ArrayType(DoubleType)),
      StructField("qi", IntegerType)))
    val q = spark.createDataFrame(
      java.util.Arrays.asList(qRows.zipWithIndex.map { case (r, i) =>
        Row(r.get(0), r.getSeq[Double](1), i) }: _*), qSchema)
    val adcScored = index.crossJoin(broadcast(q.select("query_id", "qi")))
      .withColumn("adc_dist", adcUdf(col("code"), col("qi")))
      .select("query_id", "vec_id", "adc_dist")
    if (reRank <= 0)
      Similarity.mapSideTopK(adcScored, k, scoreCol = "adc_dist",
        ascendingLong = true)
    else {
      val cand = Similarity.mapSideTopK(adcScored, reRank,
        scoreCol = "adc_dist", ascendingLong = true)
        .select("query_id", "vec_id")
      val exact = cand
        .join(index.select("vec_id", "cv"), "vec_id")
        .join(broadcast(q.select("query_id", "qv")), "query_id")
        .withColumn("cosine", Dedup.cosine(col("cv"), col("qv")))
        .select("query_id", "vec_id", "cosine")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("cosine").desc, col("vec_id").asc)
      exact.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    }
  }
}
